"""Round-3: the media decode seam graduates from bare stub to a pinned,
injectable contract (round-2 verdict item 7).

- the stub's exact output values are pinned here (golden literals), so any
  drift in the deterministic decode contract is loud;
- decode_fn injection is exercised with a custom decoder;
- the PIL production decoder runs whenever PIL exists (importorskip —
  skipped in this codec-less sandbox, active anywhere real)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kbgen_spark import fixtures as FX
from kbgen_spark.operators.multimodal import (
    _decode_image_stub,
    extract_media_features,
    media_spans,
    pil_image_decoder,
)

SF_DIR = "/root/testdata/sf0.001"


def _media(spark):
    docs = FX.interleave_documents(FX.load_flat_documents(spark, SF_DIR))
    return media_spans(docs)


def test_stub_contract_values_pinned(spark):
    """Exact golden values for the first two media rows of the sf0.001
    corpus — the driver's rows-only check sees the same rows; this pins the
    VALUES the driver cannot."""
    rows = (
        extract_media_features(_media(spark))
        .orderBy("doc_id", "span_idx")
        .limit(2)
        .collect()
    )
    got = [
        (
            r["doc_id"],
            r["span_idx"],
            r["kind"],
            r["media_ref"],
            r["n_bytes"],
            r["width"],
            r["height"],
            [round(x, 6) for x in r["feature"]],
        )
        for r in rows
    ]
    assert got == [
        (
            "0", 3, "image", "media://0/11", 128, 70, 115,
            [0.536274, 0.558824, 0.545098, 0.260784, 0.391176, 0.516667, 0.580392, 0.203922],
        ),
        (
            "1", 2, "image", "media://1/6", 128, 111, 72,
            [0.356863, 0.14902, 0.638235, 0.603922, 0.416667, 0.50098, 0.479412, 0.407843],
        ),
    ]


def test_stub_is_pure_function_of_payload():
    payload = bytes(range(64))
    w1, h1, f1 = _decode_image_stub(payload)
    w2, h2, f2 = _decode_image_stub(payload, kind="video")
    assert (w1, h1) == (w2, h2) == (64 + sum(range(4)), 64 + sum(range(4, 8)))
    np.testing.assert_array_equal(f1, f2)
    expected = np.arange(64).reshape(-1, 8).mean(axis=0) / 255.0
    np.testing.assert_allclose(f1, expected.astype(np.float32))


def test_decode_fn_injection(spark):
    """A caller-supplied decoder replaces the stub wholesale — the seam the
    production codec plugs into."""

    def fake(payload, kind):
        return 1, 2, np.full(8, 0.5, dtype=np.float32)

    out = extract_media_features(_media(spark).limit(5), decode_fn=fake).collect()
    assert len(out) == 5
    assert all(r["width"] == 1 and r["height"] == 2 for r in out)
    assert all(r["feature"] == [0.5] * 8 for r in out)


def test_pil_decoder_when_available(spark):
    """Real-codec path: runs wherever PIL exists (skipped here — no codecs
    in the sandbox; the decoder factory must then return None so callers
    fall back to the stub)."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        assert pil_image_decoder() is None
        pytest.skip("PIL not installed in this container")
    decode = pil_image_decoder()
    assert decode is not None
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (13, 7), (255, 0, 0)).save(buf, format="PNG")
    w, h, feat = decode(buf.getvalue(), "image")
    assert (w, h) == (13, 7)
    assert feat.shape == (8,) and feat.dtype == np.float32


def test_media_rows_partition_evenly(spark):
    """Scale guard: media rows repartitioned by doc bucket before the UDF
    spread across partitions (no single-worker pinning)."""
    m = _media(spark).repartition(8, "doc_id")
    sizes = [
        r["n"]
        for r in m.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert len(sizes) == 8
    assert max(sizes) < 2 * min(sizes)
