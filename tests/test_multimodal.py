"""PIL codec path for multimodal columns (r4): import-gated real
decode/resize, stub behavior unchanged when Pillow is absent."""


def test_pil_codec_requires_pillow_or_works(spark):
    """codec='pil' must either decode real bytes (Pillow present) or raise
    the documented NotImplementedError (Pillow absent) — never a silent
    fake result."""
    import pytest

    from graph_data_science_spark.datapipe.multimodal import (
        decode_images,
        synthesize_assets,
    )

    assets = synthesize_assets(spark, 4)
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError):
            decode_images(assets, codec="pil")
        return
    # hash payloads are not valid images: decode must complete with
    # decode_ok=False everywhere rather than erroring the job
    out = decode_images(assets, codec="pil").collect()
    assert len(out) == 4 and all(not r["decode_ok"] for r in out)


def test_pil_codec_real_roundtrip(spark):
    """Real PNG bytes through the PIL decode + resize paths (skipped where
    Pillow is unavailable)."""
    import pytest

    PIL = pytest.importorskip("PIL")  # noqa: N806
    import io

    import numpy as np
    from PIL import Image

    from graph_data_science_spark.datapipe.multimodal import (
        decode_images,
        resize_images,
    )

    def png_bytes(v):
        arr = np.full((16, 16, 3), v, dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return bytearray(buf.getvalue())

    rows = [(0, "image", png_bytes(0)), (1, "image", png_bytes(255))]
    assets = spark.createDataFrame(rows, "asset_id long, kind string, payload binary")
    dec = {r["asset_id"]: r for r in decode_images(assets, codec="pil", feat_dim=8).collect()}
    assert dec[0]["decode_ok"] and dec[1]["decode_ok"]
    assert abs(dec[0]["feat"][0] - 0.0) < 1e-6 and abs(dec[1]["feat"][0] - 1.0) < 1e-6
    res = {r["asset_id"]: r for r in resize_images(assets, 4, 4, codec="pil").collect()}
    assert len(res[1]["pixels"]) == 16 and abs(res[1]["pixels"][0] - 1.0) < 1e-6
