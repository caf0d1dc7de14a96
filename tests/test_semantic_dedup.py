"""SemDeDup-style semantic dedup (similarity.semantic_dedup).

Covers: planted duplicate groups collapse to exactly one survivor,
the survivor is the paper's farthest-from-centroid member, the
operator equals a driver-side numpy reference on the same cluster
assignment, NULL vectors pass through kept, and the oversize-cluster
sub-block cap bounds group size (documented recall tradeoff).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from neurostore_text_extraction_spark.operators.similarity import (
    ivf_build,
    semantic_dedup,
)

DIM = 8


def _unit(seed_vals):
    v = np.asarray(seed_vals, dtype=np.float64)
    return (v / np.linalg.norm(v)).tolist()


def _perturb(vec, idx, eps):
    v = np.asarray(vec, dtype=np.float64).copy()
    v[idx % DIM] += eps
    return (v / np.linalg.norm(v)).tolist()


def _corpus():
    """3 planted dup groups (4/3/2 near-identical members) + 5 mutually
    distant singletons. Ids are assigned so group members are NOT
    id-adjacent (exercises the sort, not the input order)."""
    g1 = _unit([1, 0, 0, 0, 0, 0, 0, 0])
    g2 = _unit([0, 1, 1, 0, 0, 0, 0, 0])
    g3 = _unit([0, 0, 0, 1, 0, 1, 0, 0])
    singles = [
        _unit([0, 0, 0, 0, 0, 0, 1, 0]),
        _unit([0, 0, 0, 0, 0, 0, 0, 1]),
        _unit([1, 1, 1, 1, 1, 1, 1, 1]),
        _unit([1, 0, 1, 0, 1, 0, 1, 0]),
        _unit([0, 1, 0, 1, 0, 1, 0, 1]),
    ]
    rows, groups = [], {}
    nid = 0

    def add(vec, gname):
        nonlocal nid
        rows.append((nid, vec))
        groups.setdefault(gname, []).append(nid)
        nid += 1

    for i in range(4):
        add(_perturb(g1, i, 0.02 * (i + 1)), "g1")
        if i < 3:
            add(_perturb(g2, i + 1, 0.015 * (i + 1)), "g2")
        if i < 2:
            add(_perturb(g3, i + 2, 0.01 * (i + 1)), "g3")
        if i < len(singles):
            add(singles[i], f"s{i}")
    add(singles[4], "s4")
    return rows, groups


def _run(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )
    kw.setdefault("n_centroids", 4)
    kw.setdefault("threshold", 0.95)
    out = semantic_dedup(df, DIM, **kw)
    return {r["vec_id"]: r.asDict() for r in out.collect()}


def test_one_survivor_per_group_singletons_kept(spark):
    rows, groups = _corpus()
    res = _run(spark, rows)
    assert set(res) == {r[0] for r in rows}
    for gname, ids in groups.items():
        kept = [i for i in ids if not res[i]["is_dup"]]
        if gname.startswith("g"):
            assert len(kept) == 1, (gname, kept)
            # every dropped member chains to a member of its own group
            for i in ids:
                if res[i]["is_dup"]:
                    assert res[i]["vec_id_dup_of"] in ids
        else:
            assert kept == ids  # singleton groups untouched


def test_survivor_is_farthest_from_centroid(spark):
    rows, groups = _corpus()
    res = _run(spark, rows)
    for gname, ids in groups.items():
        if not gname.startswith("g"):
            continue
        kept = [i for i in ids if not res[i]["is_dup"]][0]
        for i in ids:
            if i == kept:
                continue
            # paper keep order: (centroid_sim asc, id asc) — the
            # survivor precedes every dropped member of its group
            assert (res[kept]["centroid_sim"], kept) < (
                res[i]["centroid_sim"],
                i,
            ), (gname, kept, i)


def test_matches_driver_numpy_reference(spark):
    rows, _ = _corpus()
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    assigned, _cents = ivf_build(
        df, DIM, n_centroids=4, id_col="vec_id", vec_col="embedding"
    )
    lists = {r["vec_id"]: r["_list"] for r in assigned.collect()}
    res = _run(spark, rows)
    # reference: per cluster, sort by (centroid_sim asc, id), mark j a
    # dup iff any earlier member has cosine >= threshold
    by_cluster: dict[int, list[int]] = {}
    for vid, lst in lists.items():
        by_cluster.setdefault(lst, []).append(vid)
    vecs = {r[0]: np.asarray(r[1], dtype=np.float64) for r in rows}
    expect_dup = set()
    for lst, ids in by_cluster.items():
        ordered = sorted(ids, key=lambda i: (res[i]["centroid_sim"], i))
        for j_pos, j in enumerate(ordered):
            vj = vecs[j] / np.linalg.norm(vecs[j])
            for i in ordered[:j_pos]:
                vi = vecs[i] / np.linalg.norm(vecs[i])
                if float(vi @ vj) >= 0.95 - 1e-7:
                    expect_dup.add(j)
                    break
    got_dup = {i for i, r in res.items() if r["is_dup"]}
    assert got_dup == expect_dup


def test_null_vector_passes_through_kept(spark):
    rows = [(0, _unit([1, 0, 0, 0, 0, 0, 0, 0])), (1, None), (2, [1.0, 2.0])]
    res = _run(spark, rows, n_centroids=1)
    for vid in (1, 2):
        assert res[vid]["is_dup"] is False
        assert res[vid]["_list"] is None
        assert res[vid]["vec_id_dup_of"] is None
    assert res[0]["is_dup"] is False


def test_oversize_cluster_subblock_cap(spark):
    base = _unit([1, 1, 0, 0, 0, 0, 0, 0])
    rows = [(i, _perturb(base, i, 0.001)) for i in range(12)]
    # uncapped: 12 identical-ish vectors -> 1 survivor
    res = _run(spark, rows, n_centroids=1)
    assert sum(not r["is_dup"] for r in res.values()) == 1
    # capped at 4: dedup happens within each hash sub-block only, so
    # survivors == number of non-empty sub-blocks (3 blocks for 12
    # rows), strictly more than 1 and at most ceil(12/4)... blocks are
    # hash-assigned, so bound by [1, 3] non-empty blocks
    res_capped = _run(spark, rows, n_centroids=1, max_cluster_size=4)
    survivors = sum(not r["is_dup"] for r in res_capped.values())
    # 12 rows hash into ceil(12/4)=3 sub-blocks; one survivor per
    # NON-EMPTY block — bounded by [1, 3], never 12 (the cap bounds
    # work, it must not disable dedup)
    assert 1 <= survivors <= 3
    # every dropped row still chains to a row that survived its block
    for r in res_capped.values():
        if r["is_dup"]:
            assert r["vec_id_dup_of"] in res_capped


def test_threshold_is_respected(spark):
    # two vectors at cosine ~0.92: dup at threshold 0.9, kept at 0.95
    a = _unit([1, 0, 0, 0, 0, 0, 0, 0])
    theta = math.acos(0.92)
    b = _unit([math.cos(theta), math.sin(theta), 0, 0, 0, 0, 0, 0])
    rows = [(0, a), (1, b)]
    res_loose = _run(spark, rows, n_centroids=1, threshold=0.9)
    assert sum(r["is_dup"] for r in res_loose.values()) == 1
    res_tight = _run(spark, rows, n_centroids=1, threshold=0.95)
    assert sum(r["is_dup"] for r in res_tight.values()) == 0
