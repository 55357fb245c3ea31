"""Disk-backed graph segments (VERDICT r6 task 1).

The reference's headline factories are HNSW-family (Makefile:105) and its
indexes persist to files independent of RAM (faiss_extension.cpp:188-241).
Disk mode (``storage_path``) for graph factories stores one parquet
directory per add-slice with a row-count manifest; tiered compaction
merge-REWRITES small slice directories (never the whole corpus) and
concat-merges full directories by file move.
"""

import json
import os

import numpy as np
import pyspark.sql.functions as F
import pytest
from conftest import gen_vectors

from duckdb_faiss_ext_spark import FaissSparkEngine


@pytest.fixture()
def eng(spark):
    e = FaissSparkEngine(spark)
    yield e
    for name in e.list_indexes():
        e.destroy(name)


def _vec_df(spark, x, lo):
    return spark.createDataFrame(
        [(lo + i, [float(v) for v in row]) for i, row in enumerate(x)],
        "label bigint, vector array<float>",
    )


def _manifest(path):
    with open(os.path.join(path, "graph_manifest.json")) as f:
        return json.load(f)


def _search_map(eng, name, x, k=1, step=7, params=None):
    q = _vec_df(eng.spark, x[::step], 0).select(
        F.col("label").alias("qid"), "vector"
    )
    res = eng.search_flat(name, k, q, params=params or {"efSearch": 64}).collect()
    return {(r["qid"], r["rank"]): (r["label"], round(r["distance"], 5)) for r in res}


def test_disk_hnsw_roundtrip_matches_memory(spark, eng, tmp_path):
    """HNSW with storage_path: same adds, search results identical to the
    memory-mode index (seeded build => identical graphs)."""
    x = gen_vectors(150, 8)
    eng.create(
        "dg_mem", 8, "IDMap,HNSW8", metric_type="L2",
        params={"graph_partition_rows": "64"},
    )
    eng.create(
        "dg_dsk", 8, "IDMap,HNSW8", metric_type="L2",
        params={"graph_partition_rows": "64", "storage_path": str(tmp_path / "dg")},
    )
    for i in range(3):
        batch = _vec_df(spark, x[i * 50 : (i + 1) * 50], i * 50)
        eng.add("dg_mem", batch)
        eng.add("dg_dsk", batch)
    assert _search_map(eng, "dg_dsk", x, k=3) == _search_map(eng, "dg_mem", x, k=3)
    man = _manifest(str(tmp_path / "dg"))
    assert [e["rows"] for e in man["slices"]] == [50, 50, 50]
    # every slice is its own parquet directory
    root = str(tmp_path / "dg" / "graph_slices")
    assert sorted(os.listdir(root)) == [e["dir"] for e in sorted(man["slices"], key=lambda e: e["dir"])]


def test_disk_graph_tiered_compaction_rewrites_micros(spark, eng, tmp_path):
    """Explicit compact() on a disk graph index merges micro slice dirs into
    one rewritten dir (full segments form), deletes the old dirs, and
    search stays self-hit-exact."""
    path = str(tmp_path / "dgc")
    eng.create(
        "dgc", 8, "IDMap,HNSW8", metric_type="L2",
        params={"graph_partition_rows": "64", "storage_path": path},
    )
    x = gen_vectors(120, 8)
    for i in range(4):
        eng.add("dgc", _vec_df(spark, x[i * 30 : (i + 1) * 30], i * 30))
    before = _manifest(path)
    assert len(before["slices"]) == 4
    eng.compact("dgc")
    man = _manifest(path)
    assert len(man["slices"]) == 1 and man["slices"][0]["rows"] == 120
    assert sorted(os.listdir(os.path.join(path, "graph_slices"))) == [
        man["slices"][0]["dir"]
    ]
    idx = eng.registry.get("dgc")
    assert idx.data.count() == 120
    # 120 rows / 64 per segment -> 2 full segments
    assert idx.data.select("graph_seg").distinct().count() == 2
    res = _search_map(eng, "dgc", x)
    assert all(lbl == qid * 7 and _d < 1e-5 for (qid, _r), (lbl, _d) in res.items())


def test_disk_graph_full_slice_never_rebuilt(spark, eng, monkeypatch, tmp_path):
    """A slice directory already holding full-size segments is untouched by
    tiered compaction: same files on disk afterwards."""
    path = str(tmp_path / "dgf")
    eng.create(
        "dgf", 8, "IDMap,HNSW8", metric_type="L2",
        params={"graph_partition_rows": "64", "storage_path": path},
    )
    x = gen_vectors(160, 8)
    eng.add("dgf", _vec_df(spark, x[:100], 0))  # full slice (100 >= 64)
    full_dir = _manifest(path)["slices"][0]["dir"]
    files_before = set(os.listdir(os.path.join(path, "graph_slices", full_dir)))
    for i in range(3):  # three micro slices
        eng.add("dgf", _vec_df(spark, x[100 + i * 20 : 100 + (i + 1) * 20], 100 + i * 20))
    eng.compact("dgf")
    man = _manifest(path)
    assert {e["dir"] for e in man["slices"]} >= {full_dir}
    assert set(os.listdir(os.path.join(path, "graph_slices", full_dir))) == files_before
    micro_rows = sorted(e["rows"] for e in man["slices"] if e["dir"] != full_dir)
    assert micro_rows == [60]  # 3 x 20 merged into one rewritten dir
    assert eng.registry.get("dgf").data.count() == 160


def test_disk_graph_auto_compaction_at_max_slices(spark, eng, tmp_path):
    path = str(tmp_path / "dga")
    eng.MAX_SLICES = 3
    eng.create(
        "dga", 8, "IDMap,HNSW8", metric_type="L2",
        params={"graph_partition_rows": "64", "storage_path": path},
    )
    x = gen_vectors(120, 8)
    for i in range(4):
        eng.add("dga", _vec_df(spark, x[i * 30 : (i + 1) * 30], i * 30))
    man = _manifest(path)
    assert len(man["slices"]) < 4  # auto-compacted on the 3rd add
    assert sum(e["rows"] for e in man["slices"]) == 120
    res = _search_map(eng, "dga", x)
    assert all(lbl == qid * 7 and d < 1e-5 for (qid, _r), (lbl, d) in res.items())


def test_disk_graph_concat_merge_moves_files(spark, eng, monkeypatch, tmp_path):
    """More than FULL_SLICE_FANOUT full slice dirs concat-merge by file
    move: no graph rebuild runs, graphs are bit-identical afterwards."""
    path = str(tmp_path / "dgm")
    eng.create(
        "dgm", 8, "IDMap,HNSW8", metric_type="L2",
        params={"graph_partition_rows": "32", "storage_path": path},
    )
    n_adds, batch = 10, 40  # every slice >= 32 rows -> full on arrival
    x = gen_vectors(n_adds * batch, 8)
    for i in range(n_adds):
        eng.add("dgm", _vec_df(spark, x[i * batch : (i + 1) * batch], i * batch))
    idx = eng.registry.get("dgm")
    segs_before = {
        r["graph_seg"] for r in idx.data.select("graph_seg").distinct().collect()
    }
    calls = []
    monkeypatch.setattr(
        eng, "_rebuild_graph_frame",
        lambda *a, **k: calls.append(1) or (_ for _ in ()).throw(AssertionError("rebuild ran")),
    )
    eng.compact("dgm")
    assert not calls  # concat only, no graph build
    man = _manifest(path)
    assert len(man["slices"]) < n_adds
    assert sum(e["rows"] for e in man["slices"]) == n_adds * batch
    segs_after = {
        r["graph_seg"] for r in idx.data.select("graph_seg").distinct().collect()
    }
    assert segs_after == segs_before
    res = _search_map(eng, "dgm", x, step=40)
    assert all(d < 1e-5 for (_q, _r), (_l, d) in res.items())


def test_disk_ivf_hnsw_roundtrip_and_compaction(spark, eng, tmp_path):
    """IVF_HNSW composite in disk mode: cluster-partitioned slice dirs,
    per-cluster graphs survive compaction, nprobe search self-hits."""
    path = str(tmp_path / "dgi")
    eng.create(
        "dgi", 8, "IDMap,IVF4_HNSW8,Flat", metric_type="L2",
        params={
            "storage_path": path,
            "graph_partition_rows": "64",
            "min_graph_rows": "0",
        },
    )
    x = gen_vectors(240, 8)
    for i in range(4):
        eng.add("dgi", _vec_df(spark, x[i * 60 : (i + 1) * 60], i * 60))
    man = _manifest(path)
    first = man["slices"][0]["dir"]
    parts = [
        d for d in os.listdir(os.path.join(path, "graph_slices", first))
        if d.startswith("cluster_id=")
    ]
    assert parts  # cluster-partitioned layout
    eng.compact("dgi", full=True)
    man = _manifest(path)
    assert len(man["slices"]) == 1 and man["slices"][0]["rows"] == 240
    res = _search_map(eng, "dgi", x, params={"nprobe": 4, "efSearch": 64})
    assert all(lbl == qid * 7 and d < 1e-5 for (qid, _r), (lbl, d) in res.items())


def test_disk_graph_save_load_roundtrip(spark, eng, tmp_path):
    """faiss_save/faiss_load of a disk-mode graph index: the saved parquet is
    independent of the storage_path slices and searches identically."""
    path = str(tmp_path / "dgs")
    eng.create(
        "dgs", 8, "IDMap,HNSW8", metric_type="L2",
        params={"graph_partition_rows": "64", "storage_path": path},
    )
    x = gen_vectors(100, 8)
    for i in range(2):
        eng.add("dgs", _vec_df(spark, x[i * 50 : (i + 1) * 50], i * 50))
    eng.save("dgs", str(tmp_path / "saved"))
    eng.load("dgs2", str(tmp_path / "saved"))
    assert _search_map(eng, "dgs2", x, k=2) == _search_map(eng, "dgs", x, k=2)


def test_compact_fresh_engine_on_existing_storage_path(spark, eng, tmp_path):
    """A NEW engine pointed at an existing storage_path (no add this
    session) must hydrate from the manifest and compact, not raise
    (ADVICE r7: detection was via idx.data instead of the factory spec)."""
    path = str(tmp_path / "dgf")
    eng.create(
        "dgf", 8, "IDMap,HNSW8", metric_type="L2",
        params={"graph_partition_rows": "64", "storage_path": path},
    )
    x = gen_vectors(90, 8)
    for i in range(3):
        eng.add("dgf", _vec_df(spark, x[i * 30 : (i + 1) * 30], i * 30))
    n_slices = len(_manifest(path)["slices"])
    eng.destroy("dgf")

    eng2 = FaissSparkEngine(spark)
    eng2.create(
        "dgf", 8, "IDMap,HNSW8", metric_type="L2",
        params={"graph_partition_rows": "64", "storage_path": path},
    )
    eng2.compact("dgf")  # must NOT raise the non-graph disk-mode error
    man = _manifest(path)
    assert len(man["slices"]) <= n_slices
    assert sum(e["rows"] for e in man["slices"]) == 90
    res = _search_map(eng2, "dgf", x)
    assert all(lbl == qid * 7 and d < 1e-5 for (qid, _r), (lbl, d) in res.items())
    eng2.destroy("dgf")


def test_manifest_never_references_missing_dirs(spark, eng, monkeypatch, tmp_path):
    """Crash-safety ordering (ADVICE r7): the manifest on disk must be
    readable/consistent at every deletion point — simulate a crash at each
    rmtree by checking the PERSISTED manifest only references directories
    that exist with parquet files, every time a deletion runs."""
    import shutil as _sh

    path = str(tmp_path / "dgc")
    real_rmtree = _sh.rmtree
    root = os.path.abspath(os.path.join(path, "graph_slices"))

    def checked_rmtree(target, *a, **k):
        # at the moment a slice dir dies, the saved manifest must already
        # have stopped referencing it
        t = os.path.abspath(str(target))
        if os.path.dirname(t) == root:
            man = _manifest(path)
            live = {e["dir"] for e in man["slices"]}
            assert os.path.basename(t) not in live, (
                f"manifest references {t} while it is being deleted"
            )
        return real_rmtree(target, *a, **k)

    # engine code does `import shutil` inside each function, so patching the
    # module attribute covers every call site
    monkeypatch.setattr("shutil.rmtree", checked_rmtree)

    eng.MAX_SLICES = 3
    eng.create(
        "dgc", 8, "IDMap,HNSW8", metric_type="L2",
        params={"graph_partition_rows": "64", "storage_path": path},
    )
    x = gen_vectors(180, 8)
    for i in range(6):
        eng.add("dgc", _vec_df(spark, x[i * 30 : (i + 1) * 30], i * 30))
    eng.compact("dgc", full=True)
    man = _manifest(path)
    assert sum(e["rows"] for e in man["slices"]) == 180


def test_refresh_prunes_emptied_slice_and_gc_orphans(spark, eng, tmp_path):
    """Residual crash windows: (a) a manifest entry whose dir lost its
    part-files (crash inside concat after moves, before manifest save) is
    pruned on refresh; (b) an orphan unreferenced dir is GC'd by the next
    compaction."""
    path = str(tmp_path / "dgp")
    eng.create(
        "dgp", 8, "IDMap,HNSW8", metric_type="L2",
        params={"graph_partition_rows": "64", "storage_path": path},
    )
    x = gen_vectors(60, 8)
    eng.add("dgp", _vec_df(spark, x[:30], 0))
    eng.add("dgp", _vec_df(spark, x[30:], 30))
    root = os.path.join(path, "graph_slices")
    man = _manifest(path)
    assert len(man["slices"]) == 2

    # (a) simulate post-move pre-save crash: move slice 2's part-files into
    # slice 1's dir (prefixed), leaving slice 2 registered but empty
    src_e, dst_e = man["slices"][1], man["slices"][0]
    src_d, dst_d = os.path.join(root, src_e["dir"]), os.path.join(root, dst_e["dir"])
    for fname in list(os.listdir(src_d)):
        if fname.endswith(".parquet"):
            os.replace(
                os.path.join(src_d, fname),
                os.path.join(dst_d, f"{src_e['dir']}-{fname}"),
            )
    idx = eng.registry.get("dgp")
    # the prune runs only on the full-rebuild path (ADVICE r8: per-add
    # O(dirs) walks); a concat crash is observed on RESTART, so model the
    # fresh-hydration state by clearing the union cache key
    idx._disk_union_key = None
    eng._refresh_disk_graph_data(idx, _manifest(path))
    man2 = _manifest(path)
    assert [e["dir"] for e in man2["slices"]] == [dst_e["dir"]]  # pruned + persisted
    assert idx.data.count() == 60  # every row still visible via the dst dir

    # (b) orphan dir GC on compaction
    orphan = os.path.join(root, "s999999")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "junk.parquet"), "wb") as f:
        f.write(b"not really parquet")
    eng.compact("dgp")
    assert not os.path.exists(orphan)


def test_micro_batch_write_buffer(spark, eng, tmp_path):
    """Micro-batches below graph_partition_rows/4 buffer in memory (no new
    slice dir per add) and flush as ONE slice dir when a quarter segment
    accumulates; searches see buffered rows immediately (VERDICT r7
    stretch)."""
    path = str(tmp_path / "dgb")
    eng.create(
        "dgb", 8, "IDMap,HNSW8", metric_type="L2",
        params={"graph_partition_rows": "64", "storage_path": path},
    )
    x = gen_vectors(64, 8)
    # buffer threshold = 64/4 = 16 rows; 5-row adds buffer
    for i in range(3):
        eng.add("dgb", _vec_df(spark, x[i * 5 : (i + 1) * 5], i * 5))
    # nothing written yet — not even a manifest file
    assert not os.path.exists(os.path.join(path, "graph_manifest.json"))
    idx = eng.registry.get("dgb")
    assert idx.pending_graph_rows == 15
    assert idx.count == 15
    # buffered rows are searchable NOW
    res = _search_map(eng, "dgb", x[:15], step=7)
    assert all(lbl == qid * 7 and d < 1e-5 for (qid, _r), (lbl, d) in res.items())
    # 4th add crosses the threshold -> ONE slice dir with all 20 rows
    eng.add("dgb", _vec_df(spark, x[15:20], 15))
    man = _manifest(path)
    assert len(man["slices"]) == 1 and man["slices"][0]["rows"] == 20
    assert eng.registry.get("dgb").pending_graph_rows == 0
    res = _search_map(eng, "dgb", x[:20], step=7)
    assert all(lbl == qid * 7 and d < 1e-5 for (qid, _r), (lbl, d) in res.items())


def test_buffer_flushes_on_compact_and_big_batch(spark, eng, tmp_path):
    path = str(tmp_path / "dgb2")
    eng.create(
        "dgb2", 8, "IDMap,HNSW8", metric_type="L2",
        params={"graph_partition_rows": "64", "storage_path": path},
    )
    x = gen_vectors(80, 8)
    eng.add("dgb2", _vec_df(spark, x[:40], 0))  # big first add (rebuild path)
    eng.add("dgb2", _vec_df(spark, x[40:45], 40))  # buffers
    assert eng.registry.get("dgb2").pending_graph_rows == 5
    eng.compact("dgb2")  # compact flushes the buffer
    assert eng.registry.get("dgb2").pending_graph_rows == 0
    assert sum(e["rows"] for e in _manifest(path)["slices"]) == 45
    eng.add("dgb2", _vec_df(spark, x[45:50], 45))  # buffers again
    eng.add("dgb2", _vec_df(spark, x[50:80], 50))  # big batch -> flush first
    man = _manifest(path)
    assert sum(e["rows"] for e in man["slices"]) == 80
    assert eng.registry.get("dgb2").pending_graph_rows == 0
    res = _search_map(eng, "dgb2", x, step=13)
    assert all(lbl == qid * 13 and d < 1e-5 for (qid, _r), (lbl, d) in res.items())


def test_buffer_disabled_writes_through(spark, eng, tmp_path):
    path = str(tmp_path / "dgb3")
    eng.create(
        "dgb3", 8, "IDMap,HNSW8", metric_type="L2",
        params={
            "graph_partition_rows": "64",
            "storage_path": path,
            "disk_graph_buffer_rows": "0",
        },
    )
    x = gen_vectors(10, 8)
    eng.add("dgb3", _vec_df(spark, x[:5], 0))
    eng.add("dgb3", _vec_df(spark, x[5:], 5))
    man = _manifest(path)
    assert len(man["slices"]) == 2  # every add durable on return
    assert eng.registry.get("dgb3").pending_graph_rows == 0


def test_save_flushes_buffer_to_storage_path(spark, eng, tmp_path):
    """save() is a durability point: buffered micro-batches become a real
    slice dir under storage_path before the export (ADVICE r8 — save()
    previously exported idx.data but left storage_path short)."""
    path = str(tmp_path / "dgs")
    eng.create(
        "dgs", 8, "IDMap,HNSW8", metric_type="L2",
        params={"graph_partition_rows": "64", "storage_path": path},
    )
    x = gen_vectors(10, 8)
    eng.add("dgs", _vec_df(spark, x[:5], 0))
    eng.add("dgs", _vec_df(spark, x[5:], 5))
    assert eng.registry.get("dgs").pending_graph_rows == 10  # still buffered
    eng.save("dgs", str(tmp_path / "export"))
    assert eng.registry.get("dgs").pending_graph_rows == 0
    man = _manifest(path)
    assert sum(e["rows"] for e in man["slices"]) == 10
    eng.destroy("dgs")
    # a fresh engine on storage_path (process-restart model) sees all rows
    eng2 = FaissSparkEngine(spark)
    eng2.create(
        "dgs", 8, "IDMap,HNSW8", metric_type="L2",
        params={"graph_partition_rows": "64", "storage_path": path},
    )
    eng2.compact("dgs")  # hydrates from manifest
    res = _search_map(eng2, "dgs", x, step=3)
    assert all(lbl == qid * 3 and d < 1e-5 for (qid, _r), (lbl, d) in res.items())
    eng2.destroy("dgs")


def test_compact_fresh_disk_graph_is_noop(spark, eng, tmp_path):
    """compact() on a disk-mode graph index with an empty manifest and no
    buffered rows is a no-op, not the misleading non-graph disk-mode error
    (ADVICE r8)."""
    path = str(tmp_path / "dgn")
    eng.create(
        "dgn", 8, "IDMap,HNSW8", metric_type="L2",
        params={"graph_partition_rows": "64", "storage_path": path},
    )
    eng.compact("dgn")  # must not raise
    assert eng.registry.get("dgn").data is None
    assert not os.path.exists(os.path.join(path, "graph_manifest.json"))


def test_buffered_add_skips_slice_dir_walk(spark, eng, monkeypatch, tmp_path):
    """A buffered add refreshes via the cached union — it must NOT os.walk
    every slice directory (ADVICE r8: per-add O(dirs) listings hurt on
    object-store/NFS storage_path)."""
    path = str(tmp_path / "dgw")
    eng.create(
        "dgw", 8, "IDMap,HNSW8", metric_type="L2",
        params={"graph_partition_rows": "64", "storage_path": path},
    )
    x = gen_vectors(50, 8)
    eng.add("dgw", _vec_df(spark, x[:40], 0))  # big add -> slice dir exists
    calls = {"n": 0}
    orig = FaissSparkEngine._slice_dir_has_parquet

    def counting(p):
        calls["n"] += 1
        return orig(p)

    monkeypatch.setattr(FaissSparkEngine, "_slice_dir_has_parquet", staticmethod(counting))
    eng.add("dgw", _vec_df(spark, x[40:45], 40))  # buffers (threshold 16)
    eng.add("dgw", _vec_df(spark, x[45:50], 45))  # buffers
    assert calls["n"] == 0  # no dir walks on the buffered-add refresh path
    res = _search_map(eng, "dgw", x, step=7)
    assert all(lbl == qid * 7 and d < 1e-5 for (qid, _r), (lbl, d) in res.items())
