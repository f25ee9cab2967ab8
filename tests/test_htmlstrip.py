"""HTMLStripCharFilter — reference-vector parity
(HTMLStripCharFilterTest.cs)."""
import pytest

from lucenenet_spark.functions.htmlstrip import html_strip


def test_main_vector():
    html = (
        '<div class="foo">this is some text</div> here is a '
        '<a href="#bar">link</a> and another '
        '<a href="http://lucene.apache.org/">link</a>. '
        "This is an entity: &amp; plus a &lt;.  Here is an &. "
        "<!-- is a comment -->"
    )
    gold = (
        "\nthis is some text\n here is a link and another link. "
        "This is an entity: & plus a <.  Here is an &. "
    )
    assert html_strip(html) == gold


def test_gamma_and_entities():
    assert html_strip("&Gamma;") == "Γ"
    assert (
        html_strip("&nbsp; &lt;foo&gt; &Uuml;bermensch &#61; &Gamma; bar &#x393;")
        == "  <foo> Übermensch = Γ bar Γ"
    )
    assert (
        html_strip("&nbsp; &lt;junk/&gt; &nbsp; &#33; &#64; and &#8217;")
        == "  <junk/>   ! @ and ’"
    )


def test_uppercase_entity_variants():
    assert (
        html_strip(" &QUOT;-&COPY;&GT;>&LT;<&REG;&AMP;")
        == ' "-©>><<®&'
    )


def test_reserved_escaped_tags():
    test = (
        'aaa bbb <reserved ccc="ddddd"> eeee </reserved> ffff '
        '<reserved ggg="hhhh"/> <other/>'
    )
    result = html_strip(test, {"reserved"})
    assert result.index("reserved") == 9
    assert result.index("reserved", 15) == 38
    assert result.index("reserved", 41) == 54
    assert "other" not in result


def test_comments():
    assert html_strip("<!--- three dashes, still a valid comment ---> ") == " "
    assert html_strip("<! -- blah > ") == " "
    assert html_strip("<!--" + "x" * 500) == ""  # unterminated eats to EOF


def test_server_side_includes():
    test = (
        'one<img src="image.png"\n'
        " alt =  \"Alt: <!--#echo var='${IMAGE_CAPTION:<!--comment-->"
        "\\'Comment\\'}'  -->\"\n\n"
        ' title="Title: <!--#echo var=\\"IMAGE_CAPTION\\"-->">two'
    )
    assert html_strip(test) == "onetwo"
    test2 = (
        'one<script><!-- <!--#config comment="<!-- \\"comment\\"-->"--> '
        "--></script>two"
    )
    assert html_strip(test2) == "one\ntwo"


def test_script_quotes():
    test = (
        "one<script attr= bare><!-- action('<!-- comment -->', "
        '"\\"-->\\""); --></script>two'
    )
    assert html_strip(test) == "one\ntwo"
    test2 = "hello<script><!-- f('<!--internal--></script>'); --></script>"
    assert html_strip(test2) == "hello\n"


def test_escape_script_and_style():
    assert html_strip(
        "one<script no-value-attr>callSomeMethod();</script>two",
        {"SCRIPT"},
    ) == "one<script no-value-attr></script>two"
    assert html_strip(
        'one<style type="text/css"> body,font,a { font-family:arial; } '
        "</style>two",
        {"STYLE"},
    ) == 'one<style type="text/css"></style>two'


def test_style():
    test = (
        'one<style type="text/css">\n<!--\n'
        "@import url('http://www.lasletrasdecanciones.com/css.css');\n"
        "-->\n</style>two"
    )
    assert html_strip(test) == "one\ntwo"


def test_br():
    assert html_strip("one<BR />two<br>three") == "one\ntwo\nthree"
    assert html_strip("one<BR some stuff here too>two</BR>") == "one\ntwo\n"
    assert html_strip(
        "one<BR class='whatever'>two</\nBR\n>", {"BR"}
    ) == "one<BR class='whatever'>two</\nBR\n>"


def test_inline_tags_no_space():
    assert html_strip(
        'one<sPAn class="invisible">two<sup>2<sup>e</sup></sup>.</SpaN>three'
    ) == "onetwo2e.three"


def test_cdata():
    assert html_strip(
        "one<![CDATA[<one><two>three<four></four></two></one>]]>two"
    ) == "one<one><two>three<four></four></two></one>two"


def test_msword_malformed_pi():
    assert html_strip(
        'one<?xml:namespace prefix = o ns = '
        '"urn:schemas-microsoft-com:office:office" />two'
    ) == "onetwo"


def test_supplementary_chars_in_tags():
    test = (
        "one<\U00029b05艱鍟䇹愯瀛>two<瀛愯\U00029b05>three 瀛愯\U00029b05"
        "</瀛愯\U00029b05>four</\U00029b05艱鍟䇹愯瀛>five<\U00020000\U00020000>"
        "six<\U00020000\U00020000/>seven"
    )
    assert html_strip(test) == "one\ntwo\nthree 瀛愯\U00029b05\nfour\nfive\nsix\nseven"


def test_literal_angle_and_amp():
    assert html_strip("one < two & three") == "one < two & three"
    assert html_strip("X &zz; Y") == "X &zz; Y"


def test_html_strip_udf(spark):
    from lucenenet_spark.functions.htmlstrip import html_strip_udf

    df = spark.createDataFrame(
        [('<p>hello</p> <b>world</b> &amp; <a href="#">link</a>',)],
        "text string",
    )
    got = df.select(html_strip_udf()("text")).collect()[0][0]
    assert got == ["hello", "world", "&", "link"]
