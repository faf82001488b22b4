"""Multimodal plumbing tests: schema, batch shape, determinism, stub gating."""

from __future__ import annotations

import pytest

from syscol_spark.operators.multimodal import (
    ASSET_SCHEMA,
    FEATURE_DIM,
    documents_as_assets,
    extract_features,
    sample_frames,
)
from syscol_spark.sources.tables import load_table


def test_assets_schema(spark, sf_dir):
    assets = documents_as_assets(load_table(spark, sf_dir, "documents"))
    assert [f.name for f in assets.schema.fields] == [f.name for f in ASSET_SCHEMA.fields]
    row = assets.limit(1).collect()[0]
    assert isinstance(bytes(row["blob"]), bytes)
    assert row["meta"]["source"].startswith("src")


def test_feature_extraction_shape_and_determinism(spark, sf_dir):
    assets = documents_as_assets(load_table(spark, sf_dir, "documents")).limit(10)
    f1 = {r["asset_id"]: r["feature"] for r in extract_features(assets).collect()}
    f2 = {r["asset_id"]: r["feature"] for r in extract_features(assets).collect()}
    assert len(f1) == 10
    for aid, feat in f1.items():
        assert len(feat) == FEATURE_DIM
        assert all(-1.0 <= x < 1.0 for x in feat)
        assert f2[aid] == feat  # deterministic across runs


def test_real_decoder_is_stubbed(spark, sf_dir):
    assets = documents_as_assets(load_table(spark, sf_dir, "documents"))
    with pytest.raises(NotImplementedError, match="pillow"):
        extract_features(assets, decoder="pillow")


def test_resize_stub_shapes(spark, sf_dir):
    from syscol_spark.operators.multimodal import resize_assets

    assets = documents_as_assets(load_table(spark, sf_dir, "documents")).limit(4)
    out = resize_assets(assets, width=8, height=4).collect()
    assert len(out) == 4
    for r in out:
        assert (r["width"], r["height"]) == (8, 4)
        assert len(bytes(r["blob"])) == 8 * 4  # resized payload is exactly w*h
    with pytest.raises(NotImplementedError):
        resize_assets(assets, decoder="opencv").collect()


def test_frame_sampling_multiplies_rows(spark, sf_dir):
    assets = documents_as_assets(load_table(spark, sf_dir, "documents")).limit(5)
    frames = sample_frames(assets, every_n_bytes=64, max_frames=3).collect()
    per_asset = {}
    for r in frames:
        per_asset.setdefault(r["asset_id"], []).append(r["frame_idx"])
    assert len(per_asset) == 5
    for idxs in per_asset.values():
        assert sorted(idxs) == list(range(len(idxs)))  # contiguous frame ids
        assert 1 <= len(idxs) <= 3


def test_stub_features_batch_matches_scalar_definition():
    """The vectorized batch stub must stay bit-identical to the per-row
    definition for arbitrary blobs (the docstring's contract)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from syscol_spark.operators.multimodal import _stub_feature, _stub_features_batch

    @settings(max_examples=60, deadline=None)
    @given(blobs=st.lists(st.binary(max_size=64), min_size=1, max_size=5),
           dim=st.sampled_from([8, 17, 64]))
    def check(blobs, dim):
        batch = _stub_features_batch(blobs, dim)
        for b, row in zip(blobs, batch):
            assert row == _stub_feature(b, dim)
            assert len(row) == dim

    check()
