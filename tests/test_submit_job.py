"""End-to-end spark-submit packaging test: build the zip, run the extract
job via the packaged entry point (with and without resume), verify output
matches the in-process pipeline."""

import os
import subprocess
import sys
import tempfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_package_zip_builds():
    sys.path.insert(0, os.path.join(ROOT, "jobs"))
    import package
    out = package.build(os.path.join(tempfile.mkdtemp(), "eng.zip"))
    import zipfile
    names = zipfile.ZipFile(out).namelist()
    assert "rasterkit_spark/kernels.py" in names
    assert "rasterkit_spark/operators/extract.py" in names


@pytest.mark.slow
def test_submit_master_not_overridden(tmp_path):
    """`spark-submit --master <m> script.py` carries the master via the
    spark.master system property, NOT PYSPARK_SUBMIT_ARGS (that env var is
    only set for the interactive pyspark shell) — get_spark must detect it
    through SparkConf(loadDefaults=True) and NOT stamp local[cores] over
    it, or a cluster job silently runs single-node."""
    import pyspark
    submit = os.path.join(os.path.dirname(pyspark.__file__),
                          "bin", "spark-submit")
    probe = tmp_path / "probe.py"
    probe.write_text(
        "import sys; sys.path.insert(0, %r)\n"
        "from rasterkit_spark.session import get_spark\n"
        "s = get_spark('probe', cores=7)\n"
        "print('MASTER=' + s.conf.get('spark.master'))\n"
        "s.stop()\n" % ROOT)
    env = dict(os.environ, SPARK_GRAFT_CPUS="7")
    env.pop("PYSPARK_SUBMIT_ARGS", None)
    env.pop("SPARK_MASTER", None)
    env.pop("MASTER", None)
    r = subprocess.run([submit, "--master", "local[3]", str(probe)],
                       capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "MASTER=local[3]" in r.stdout, (r.stdout[-500:], r.stderr[-500:])


@pytest.mark.slow
def test_run_job_extract_resumable(spark, tmp_path):
    from rasterkit_spark.fixtures import corpus as CP
    from rasterkit_spark.operators import extract as EX

    c = CP.build_corpus(n_media=8, n_docs=10, n_queries=10)
    sdfs = c.to_spark(spark, ["queries_bbox", "media_catalog", "tiles"])
    paths = {}
    for k, df in sdfs.items():
        p = str(tmp_path / k)
        df.write.parquet(p)
        paths[k] = p
    out = str(tmp_path / "out")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "jobs", "run_job.py"),
         "--job", "extract", "--queries", paths["queries_bbox"],
         "--catalog", paths["media_catalog"], "--tiles", paths["tiles"],
         "--out", out, "--resume-id", "t1",
         "--base-dir", str(tmp_path / "ckpt"), "--buckets", "4"],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    got = spark.read.parquet(out)
    want = EX.extract(sdfs["queries_bbox"], sdfs["media_catalog"],
                      sdfs["tiles"])
    assert got.count() == want.count()
    g = {(r.query_id, r.window_sha256) for r in got.collect()}
    w = {(r.query_id, r.window_sha256) for r in want.collect()}
    assert g == w


@pytest.mark.slow
def test_true_spark_submit_with_py_files(spark, tmp_path):
    """REAL ``spark-submit --py-files dist.zip`` (north_rule packaging):
    the entry script is copied to a bare temp dir so ``rasterkit_spark``
    is importable ONLY from the shipped zip — a sys.path leak back to the
    repo would go undetected by the plain-subprocess flavor above."""
    import shutil

    import pyspark
    submit = os.path.join(os.path.dirname(pyspark.__file__),
                          "bin", "spark-submit")
    sys.path.insert(0, os.path.join(ROOT, "jobs"))
    import package
    zip_path = package.build(str(tmp_path / "eng.zip"))
    entry = str(tmp_path / "run_job.py")
    shutil.copy(os.path.join(ROOT, "jobs", "run_job.py"), entry)

    from rasterkit_spark.fixtures import corpus as CP
    c = CP.build_corpus(n_media=6, n_docs=10, n_queries=6)
    sdfs = c.to_spark(spark, ["queries_bbox", "media_catalog", "tiles"])
    paths = {}
    for k, df in sdfs.items():
        p = str(tmp_path / k)
        df.write.parquet(p)
        paths[k] = p
    out = str(tmp_path / "out_submit")
    env = dict(os.environ)
    env.pop("PYSPARK_SUBMIT_ARGS", None)
    r = subprocess.run(
        [submit, "--master", "local[4]", "--py-files", zip_path, entry,
         "--job", "extract", "--queries", paths["queries_bbox"],
         "--catalog", paths["media_catalog"], "--tiles", paths["tiles"],
         "--out", out],
        capture_output=True, text=True, env=env, timeout=420,
        cwd=str(tmp_path))
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2000:])
    got = spark.read.parquet(out)
    from rasterkit_spark.operators import extract as EX
    want = EX.extract(sdfs["queries_bbox"], sdfs["media_catalog"],
                      sdfs["tiles"])
    g = {(x.query_id, x.window_sha256) for x in got.collect()}
    w = {(x.query_id, x.window_sha256) for x in want.collect()}
    assert g == w


@pytest.mark.slow
def test_run_job_corpus_pipeline(spark, tmp_path):
    """The corpus job flavor: spark-submit surface over the composed
    prep pipeline must equal the in-process call."""
    from rasterkit_spark.operators.pipeline import corpus_pipeline

    docs_all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = docs_all.filter("doc_id % 9 != 0")
    bench = docs_all.filter("doc_id % 9 = 0")
    p_docs, p_bench = str(tmp_path / "docs"), str(tmp_path / "bench")
    docs.write.parquet(p_docs)
    bench.write.parquet(p_bench)
    out = str(tmp_path / "out_corpus")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "jobs", "run_job.py"),
         "--job", "corpus", "--docs", p_docs, "--benchmark", p_bench,
         "--min-quality", "80", "--max-contamination-e6", "900000",
         "--seq-len", "64", "--out", out],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    got = spark.read.parquet(out).toPandas()
    want = corpus_pipeline(docs, bench, min_quality=80,
                           max_contamination_e6=900_000,
                           seq_len=64).toPandas()
    key = sorted(got.columns)
    assert sorted(want.columns) == key
    g = got[key].sort_values(key).reset_index(drop=True)
    w = want[key].sort_values(key).reset_index(drop=True)
    assert g.equals(w) and len(g) > 0
