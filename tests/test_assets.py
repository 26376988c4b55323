"""Asset-layer tests: cached-fetcher concurrency (the reference's 64-process
race contract, tests/test_s3_cached_fetcher.py) and manifest lookups."""

import multiprocessing as mp
import os
import time

import pandas as pd
import pytest

from variantformer_tpu.utils.assets import CachedFetcher, ManifestLookup


def _slow_transport_factory(src_dir, delay):
    def transport(rel, dst_tmp):
        time.sleep(delay)
        with open(os.path.join(src_dir, rel), "rb") as fh, open(dst_tmp, "wb") as out:
            out.write(fh.read())
    return transport


def _worker(args):
    src_dir, cache_dir, rel = args
    fetcher = CachedFetcher(
        tmp_dir=cache_dir, transport=_slow_transport_factory(src_dir, 0.05)
    )
    path = fetcher.get(rel)
    with open(path, "rb") as fh:
        return path, fh.read()


def test_concurrent_fetch_converges(tmp_path):
    src = tmp_path / "remote"
    src.mkdir()
    payload = os.urandom(4096)
    (src / "artifact.bin").write_bytes(payload)
    cache = tmp_path / "cache"

    args = [(str(src), str(cache), "artifact.bin")] * 16
    with mp.get_context("spawn").Pool(8) as pool:
        results = pool.map(_worker, args)
    paths = {p for p, _ in results}
    assert len(paths) == 1, "all workers must converge on one cached file"
    for _, data in results:
        assert data == payload
    # the lock must be released (a fresh fetch succeeds immediately)
    fetcher = CachedFetcher(tmp_dir=str(cache),
                            transport=_slow_transport_factory(str(src), 0))
    assert fetcher.get("artifact.bin") in paths


def test_manifest_lookup(tmp_path):
    manifest = tmp_path / "manifest.parquet"
    files = {}
    rows = []
    for gene in ["G1", "G2"]:
        f = tmp_path / f"{gene}.csv"
        f.write_text("a,b\n1,2\n")
        rows.append({"gene_id": gene, "file_path": str(f)})
        files[gene] = str(f)
    pd.DataFrame(rows).to_parquet(manifest)
    lookup = ManifestLookup(str(manifest), ("gene_id",))
    assert lookup.exists("G1")
    assert not lookup.exists("G3")
    assert lookup.get_file_path("G2") == files["G2"]
    assert lookup.get_file_path("G3") is None
    assert lookup.get_unique("gene_id") == ["G1", "G2"]


def test_two_key_manifest(tmp_path):
    manifest = tmp_path / "m.parquet"
    f = tmp_path / "x.bin"
    f.write_bytes(b"x")
    pd.DataFrame(
        [{"gene_id": "G1", "population": "EUR", "file_path": str(f)}]
    ).to_parquet(manifest)
    lookup = ManifestLookup(str(manifest), ("gene_id", "population"))
    assert lookup.exists("G1", "EUR")
    assert not lookup.exists("G1", "AFR")
