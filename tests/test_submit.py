"""North-rule launch mode: the pipeline runs via ``spark-submit
--py-files`` with the package zip as the only code source (cwd is a
temp dir, so a repo-relative import cannot mask a packaging gap)."""

import json
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    from neurostore_text_extraction_spark.sources.pages import (
        generate_pages,
        pages_view,
    )

    input_dir = str(tmp_path / "pages")
    pages_view(generate_pages(spark, 30, 4)).write.parquet(input_dir)
    store = str(tmp_path / "store")

    def submit():
        out = subprocess.run(
            [str(REPO / "scripts" / "submit.sh"), "--input", input_dir, "--store", store],
            capture_output=True,
            text=True,
            cwd=str(tmp_path),  # foreign cwd: only --py-files provides the package
            env={
                **__import__("os").environ,
                "MASTER": "local[4]",
                "PYSPARK_PYTHON": sys.executable,
                # a repo PYTHONPATH would mask packaging gaps — strip it
                "PYTHONPATH": "",
            },
            timeout=300,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        assert lines, out.stdout + out.stderr
        return json.loads(lines[-1])

    r1 = submit()
    assert r1 == {**r1, "n_processed": 30, "n_errors": 0, "skipped": False}
    # second submit: whole-run memoization across separate submits
    r2 = submit()
    assert r2["skipped"] is True
