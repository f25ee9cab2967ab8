"""Package the engine for spark-submit --py-files.

  python scripts/make_pyfiles_zip.py [out.zip]
  spark-submit --master <cluster> --py-files lucenenet_spark.zip scripts/submit_job.py
"""
import os
import sys
import zipfile

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "lucenenet_spark.zip")
n = 0
with zipfile.ZipFile(out, "w") as z:
    pkg = os.path.join(repo, "lucenenet_spark")
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, repo))
                n += 1
print(f"wrote {out} ({n} files)")
