"""SemDeDup: planted exact/near duplicates must cluster together and
be removed (min-id survivor); clean vectors must survive untouched."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from vietnamese_ocr_ray.functions.semdedup import semdedup, semdedup_pairs


def _blobs(n_per=40, n_centers=4, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_centers, dim)) * 8
    rows, ids = [], []
    vid = 0
    for c in range(n_centers):
        for _ in range(n_per):
            rows.append(centers[c] + rng.normal(size=dim) * 0.5)
            ids.append(vid)
            vid += 1
    return ids, np.asarray(rows)


def _ds(ids, vecs):
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    pa.list_(pa.float64()),
                ),
            }
        )
    )


def test_semdedup_removes_planted_near_dups(ray_session):
    ids, vecs = _blobs()
    # plant: ids 1000/1001 duplicate vec 0 (tiny noise), 1002 dups vec 50
    rng = np.random.default_rng(9)
    dup_ids = [1000, 1001, 1002]
    dups = np.stack(
        [
            vecs[0] + rng.normal(size=vecs.shape[1]) * 1e-4,
            vecs[0] + rng.normal(size=vecs.shape[1]) * 1e-4,
            vecs[50] + rng.normal(size=vecs.shape[1]) * 1e-4,
        ]
    )
    all_ids = ids + dup_ids
    all_vecs = np.vstack([vecs, dups])
    kept = set(
        semdedup(_ds(all_ids, all_vecs), n_clusters=4, threshold=0.9999)
        .to_pandas()["vec_id"]
    )
    # min-id survivors: 0 and 50 stay, planted dups go
    assert 0 in kept and 50 in kept
    assert not kept & set(dup_ids)
    # everything else untouched
    assert len(kept) == len(all_ids) - len(dup_ids)


def test_semdedup_pairs_partitioning_invariant(ray_session):
    ids, vecs = _blobs(n_per=25)
    a = (
        semdedup_pairs(_ds(ids, vecs), n_clusters=4, threshold=0.95)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    b = (
        semdedup_pairs(
            _ds(ids, vecs).repartition(6), n_clusters=4, threshold=0.95
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert a.equals(b)
