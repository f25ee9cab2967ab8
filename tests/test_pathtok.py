"""Path-hierarchy tokenizers + PositionFilter — reference-vector parity.

Vectors from Tests.Analysis.Common/Analysis/Path/
TestPathHierarchyTokenizer.cs / TestReversePathHierarchyTokenizer.cs and
Analysis/Position/PositionFilterTest.cs semantics.
"""
import pytest

from lucenenet_spark.functions.pathtok import (
    path_hierarchy_tokens,
    position_filter,
    reverse_path_hierarchy_tokens,
)

# (path, kwargs, [(term, start, end, posinc), ...])
FWD_VECTORS = [
    (
        "/a/b/c",
        {},
        [("/a", 0, 2, 1), ("/a/b", 0, 4, 0), ("/a/b/c", 0, 6, 0)],
    ),
    (
        "/a/b/c/",
        {},
        [
            ("/a", 0, 2, 1),
            ("/a/b", 0, 4, 0),
            ("/a/b/c", 0, 6, 0),
            ("/a/b/c/", 0, 7, 0),
        ],
    ),
    ("a/b/c", {}, [("a", 0, 1, 1), ("a/b", 0, 3, 0), ("a/b/c", 0, 5, 0)]),
    (
        "a/b/c/",
        {},
        [
            ("a", 0, 1, 1),
            ("a/b", 0, 3, 0),
            ("a/b/c", 0, 5, 0),
            ("a/b/c/", 0, 6, 0),
        ],
    ),
    ("/", {}, [("/", 0, 1, 1)]),
    ("//", {}, [("/", 0, 1, 1), ("//", 0, 2, 0)]),
    (
        "/a/b/c",
        {"delimiter": "/", "replacement": "\\"},
        [("\\a", 0, 2, 1), ("\\a\\b", 0, 4, 0), ("\\a\\b\\c", 0, 6, 0)],
    ),
    (
        "c:\\a\\b\\c",
        {"delimiter": "\\", "replacement": "\\"},
        [
            ("c:", 0, 2, 1),
            ("c:\\a", 0, 4, 0),
            ("c:\\a\\b", 0, 6, 0),
            ("c:\\a\\b\\c", 0, 8, 0),
        ],
    ),
    ("/a/b/c", {"skip": 1}, [("/b", 2, 4, 1), ("/b/c", 2, 6, 0)]),
    (
        "/a/b/c/",
        {"skip": 1},
        [("/b", 2, 4, 1), ("/b/c", 2, 6, 0), ("/b/c/", 2, 7, 0)],
    ),
    ("a/b/c", {"skip": 1}, [("/b", 1, 3, 1), ("/b/c", 1, 5, 0)]),
    (
        "a/b/c/",
        {"skip": 1},
        [("/b", 1, 3, 1), ("/b/c", 1, 5, 0), ("/b/c/", 1, 6, 0)],
    ),
    ("/", {"skip": 1}, []),
    ("//", {"skip": 1}, [("/", 1, 2, 1)]),
]


@pytest.mark.parametrize("path,kw,want", FWD_VECTORS)
def test_path_hierarchy_vectors(path, kw, want):
    assert path_hierarchy_tokens(path, **kw) == want


REV_VECTORS = [
    (
        "/a/b/c",
        {},
        [
            ("/a/b/c", 0, 6, 1),
            ("a/b/c", 1, 6, 0),
            ("b/c", 3, 6, 0),
            ("c", 5, 6, 0),
        ],
    ),
    (
        "/a/b/c/",
        {},
        [
            ("/a/b/c/", 0, 7, 1),
            ("a/b/c/", 1, 7, 0),
            ("b/c/", 3, 7, 0),
            ("c/", 5, 7, 0),
        ],
    ),
    (
        "a/b/c",
        {},
        [("a/b/c", 0, 5, 1), ("b/c", 2, 5, 0), ("c", 4, 5, 0)],
    ),
    (
        "a/b/c/",
        {},
        [("a/b/c/", 0, 6, 1), ("b/c/", 2, 6, 0), ("c/", 4, 6, 0)],
    ),
    ("/", {}, [("/", 0, 1, 1)]),
    ("//", {}, [("//", 0, 2, 1), ("/", 1, 2, 0)]),
    (
        "/a/b/c/",
        {"skip": 1},
        [("/a/b/", 0, 5, 1), ("a/b/", 1, 5, 0), ("b/", 3, 5, 0)],
    ),
    ("a/b/c", {"skip": 1}, [("a/b/", 0, 4, 1), ("b/", 2, 4, 0)]),
    ("a/b/c/", {"skip": 1}, [("a/b/", 0, 4, 1), ("b/", 2, 4, 0)]),
    ("/", {"skip": 1}, []),
    ("//", {"skip": 1}, [("/", 0, 1, 1)]),
    ("/a/b/c/", {"skip": 2}, [("/a/", 0, 3, 1), ("a/", 1, 3, 0)]),
]


@pytest.mark.parametrize("path,kw,want", REV_VECTORS)
def test_reverse_path_hierarchy_vectors(path, kw, want):
    assert reverse_path_hierarchy_tokens(path, **kw) == want


def test_position_filter():
    # PositionFilter: first increment kept, later ones forced
    assert position_filter([1, 1, 1, 1]) == [1, 0, 0, 0]
    assert position_filter([1, 2, 1], 5) == [1, 5, 5]
    assert position_filter([]) == []
    with pytest.raises(ValueError):
        position_filter([1], -1)


def test_path_hierarchy_udf(spark):
    from lucenenet_spark.functions.pathtok import path_hierarchy_udf

    df = spark.createDataFrame([("/a/b/c",)], "text string")
    rows = df.select(
        path_hierarchy_udf()("text").alias("fwd"),
        path_hierarchy_udf(reverse=True)("text").alias("rev"),
        path_hierarchy_udf(skip=1)("text").alias("skip1"),
    ).collect()
    assert rows[0]["fwd"] == ["/a", "/a/b", "/a/b/c"]
    assert rows[0]["rev"] == ["/a/b/c", "a/b/c", "b/c", "c"]
    assert rows[0]["skip1"] == ["/b", "/b/c"]
