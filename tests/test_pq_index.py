"""IVF-PQ build/search split (llm/pq_index): prebuilt-index search must
be bit-identical to the end-to-end composition, the batch (broadcast)
ADC form must match the literal form, the codes read must
partition-prune to the probed cells, and the manifest protocol must
version rebuilds."""

import pytest
from pyspark.sql import functions as F

from bacon_spark.llm import pq as _pq
from bacon_spark.llm import pq_index as _pqi

SF = "/root/testdata/sf0.001"


def _emb(spark):
    from bacon_spark.sources.star import read_table

    return read_table(spark, SF, "embeddings")


def _probes(emb, n=5):
    return [
        (r["vec_id"], list(r["v"]))
        for r in emb.filter(F.col("vec_id") < n)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .orderBy("vec_id")
        .collect()
    ]


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("ivfpq"))


@pytest.fixture(scope="module")
def built(spark, index_dir):
    from bacon_spark.utils.caching import release_caches

    emb = _emb(spark)
    info = _pqi.ivfpq_index_build(emb, index_dir, coarse_k=4, m=8, k=8, dim=64)
    release_caches()
    return info


def test_build_writes_partitioned_codes_and_manifest(built, index_dir):
    import os

    assert built["n_vectors"] == 500 and built["version"] == 1
    data = os.path.join(index_dir, built["data_dir"])
    cells = [d for d in os.listdir(data) if d.startswith("cell=")]
    assert len(cells) == built["n_cells"] >= 2
    idx = _pqi.load_index(index_dir)
    assert len(idx["codebooks"]) == 8 and idx["coarse_centroids"]


def test_prebuilt_search_matches_end_to_end(spark, built, index_dir):
    from bacon_spark.utils.caching import release_caches

    emb = _emb(spark)
    probes = _probes(emb)
    e2e = _pq.ivfpq_ann_topk(emb, probes, coarse_k=4, m=8, k=8, dim=64, nprobe=2, n=10)
    want = [tuple(r) for r in e2e.collect()]
    release_caches()
    got = [
        tuple(r)
        for r in _pqi.ivfpq_index_search(spark, index_dir, probes, nprobe=2, n=10).collect()
    ]
    assert got == want and len(got) > 0


def test_search_plan_partition_prunes(spark, built, index_dir):
    probes = _probes(_emb(spark), 3)
    df = _pqi.ivfpq_index_search(spark, index_dir, probes, nprobe=1, n=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the cell IN (...) filter must reach the scan as a PartitionFilter
    # (directory pruning), not a post-scan Filter
    assert "PartitionFilters: [cell" in plan.replace("#", " #").replace(
        "cell #", "cell"
    ) or "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]


def test_batch_adc_equals_literal(spark, built, index_dir):
    probes = _probes(_emb(spark), 5)
    lit = _pqi.ivfpq_index_search(
        spark, index_dir, probes, nprobe=2, n=10, literal_threshold=10**9
    )
    bat = _pqi.ivfpq_index_search(
        spark, index_dir, probes, nprobe=2, n=10, literal_threshold=0
    )
    assert [tuple(r) for r in lit.collect()] == [tuple(r) for r in bat.collect()]
    plan = bat._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_thousand_probe_batch_smoke(spark, built, index_dir):
    # 1000 probes * nprobe 2 * m 8 * k 8 = 128k ADC floats: far past the
    # literal threshold, must auto-pick the broadcast form and complete
    emb = _emb(spark)
    base = _probes(emb, 10)
    probes = [(1000 + i, base[i % len(base)][1]) for i in range(1000)]
    out = _pqi.ivfpq_index_search(spark, index_dir, probes, nprobe=2, n=3)
    assert out.count() == 3000  # 3 hits per probe


def test_rebuild_versions_via_manifest(spark, index_dir, built):
    from bacon_spark.utils.caching import release_caches

    emb = _emb(spark)
    info2 = _pqi.ivfpq_index_build(emb, index_dir, coarse_k=2, m=4, k=4, dim=64)
    release_caches()
    assert info2["version"] == built["version"] + 1
    # old version still readable (time travel), new one is the default
    assert _pqi.load_index(index_dir, built["version"])["coarse_k"] == 4
    assert _pqi.load_index(index_dir)["coarse_k"] == 2
    probes = _probes(emb, 2)
    assert _pqi.ivfpq_index_search(spark, index_dir, probes, n=3).count() == 6


# --- incremental append (frozen-model ingest) ---


@pytest.fixture(scope="module")
def appended(spark, tmp_path_factory):
    """Index trained on vec_id % 4 != 0, remaining quarter appended."""
    from bacon_spark.utils.caching import release_caches

    path = str(tmp_path_factory.mktemp("ivfpq_append"))
    emb = _emb(spark)
    _pqi.ivfpq_index_build(
        emb.filter("vec_id % 4 != 0"), path, coarse_k=4, m=8, k=8, dim=64
    )
    release_caches()
    info = _pqi.ivfpq_index_append(emb.filter("vec_id % 4 = 0"), path)
    return path, info


def test_append_commits_new_version_with_prior_files(appended):
    from bacon_spark.operators.maintenance import read_manifest

    path, info = appended
    assert info["version"] == 2 and info["n_appended"] == 125
    man = read_manifest(path)
    assert man["op"] == "ivfpq-append"
    dirs = {f["path"].split("/")[0] for f in man["files"]}
    assert len(dirs) == 2 and info["data_dir"] in dirs  # old + delta files
    # the model is untouched by the append
    v1, v2 = _pqi.load_index(path, 1), _pqi.load_index(path, 2)
    assert v1["coarse_centroids"] == v2["coarse_centroids"]
    assert v1["codebooks"] == v2["codebooks"]
    assert v2["data_dirs"] == [v1["data_dir"], info["data_dir"]]


def test_append_snapshot_isolation(spark, appended):
    path, _ = appended
    emb = _emb(spark)
    probes = _probes(emb)
    old = _pqi.ivfpq_index_search(spark, path, probes, nprobe=4, n=500, version=1)
    new = _pqi.ivfpq_index_search(spark, path, probes, nprobe=4, n=500, version=2)
    old_ids = {r["vec_id"] for r in old.collect()}
    new_ids = {r["vec_id"] for r in new.collect()}
    # a reader pinned to v1 never sees appended vectors
    assert not any(v % 4 == 0 for v in old_ids)
    # the appended quarter is searchable at v2
    assert any(v % 4 == 0 for v in new_ids)
    assert old_ids <= new_ids


def test_append_coding_matches_from_scratch_encode(spark, appended):
    """Frozen-model append coding == encoding the full corpus from
    scratch under the same (subset-trained) model."""
    from bacon_spark.utils.caching import release_caches

    path, _ = appended
    emb = _emb(spark)
    idx = _pqi.load_index(path)
    resid = _pq.residual_frame(emb, idx["coarse_centroids"], 64)
    want = sorted(
        map(tuple, _pq.ivfpq_encode(resid, idx["codebooks"], "vec_id").collect())
    )
    import os

    legs = [
        spark.read.parquet(os.path.join(path, d)) for d in idx["data_dirs"]
    ]
    got_df = legs[0]
    for leg in legs[1:]:
        got_df = got_df.unionByName(leg)
    # column order: match the encode frame's order explicitly
    cols = _pq.ivfpq_encode(resid, idx["codebooks"], "vec_id").columns
    got = sorted(map(tuple, got_df.select(*cols).collect()))
    release_caches()
    assert got == want


# ---------------------------------------------------------------------------
# plain-PQ index (round 8): q160's once-per-ingest artifact
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pq_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("pq"))


@pytest.fixture(scope="module")
def pq_built(spark, pq_dir):
    from bacon_spark.utils.caching import release_caches

    info = _pqi.pq_index_build(_emb(spark), pq_dir, m=8, k=8, dim=64)
    release_caches()
    return info


def test_pq_build_writes_codes_and_manifest(pq_built, pq_dir):
    import os

    assert pq_built["n_vectors"] == 500 and pq_built["version"] == 1
    man = __import__(
        "bacon_spark.operators.maintenance", fromlist=["read_manifest"]
    ).read_manifest(pq_dir)
    assert man["index"]["kind"] == "pq" and len(man["index"]["codebooks"]) == 8
    assert os.path.isdir(os.path.join(pq_dir, pq_built["data_dir"]))


def test_pq_prebuilt_search_matches_end_to_end(spark, pq_built, pq_dir):
    """The persisted-codes search must be BIT-identical to the inline
    train+encode+score composition (same scoring function, deterministic
    codes) — the guarantee that lets gate q160 keep its full-replay
    oracle while paying search-only cost."""
    from bacon_spark.utils.caching import release_caches

    emb = _emb(spark)
    probes = _probes(emb)
    cbs = _pq.pq_codebooks(emb, m=8, k=8, dim=64)
    want = [tuple(r) for r in _pq.pq_ann_topk(emb, cbs, probes, n=10).collect()]
    release_caches()
    got = [
        tuple(r)
        for r in _pqi.pq_index_search(spark, pq_dir, probes, n=10).collect()
    ]
    assert got == want and len(got) == 50


def test_pq_search_rejects_ivfpq_manifest(spark, built, index_dir):
    with pytest.raises(FileNotFoundError):
        _pqi.pq_index_search(spark, index_dir, [(0, [0.0] * 64)])
