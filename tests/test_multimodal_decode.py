"""Contract test for the multimodal decode seam: the SAME test passes
in this container (no PIL → byte-statistics fallback) and unchanged in
an image that ships PIL (real pixel decode) — proving the gate is
wired in both directions rather than raising the moment a decoder
appears.

The valid test image is a minimal grayscale PNG built with nothing but
stdlib zlib/struct, so the test needs no imaging library to CONSTRUCT
what only PIL can DECODE.
"""

from __future__ import annotations

import struct
import zlib

from uchr_scetl_spark.llm.multimodal import HAVE_PIL, decode_media

# 2×2 grayscale pixels, chosen so pixel stats ≠ byte stats of the file
_PIXELS = [[10, 20], [30, 200]]
_PIXEL_MEAN = (10 + 20 + 30 + 200) / 4.0  # 65.0
_PIXEL_FIRST = 10.0


def _make_png(rows: list[list[int]]) -> bytes:
    """Minimal valid 8-bit grayscale PNG from raw pixel rows."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    w, h = len(rows[0]), len(rows)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)  # filter 0 per row
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decode_media_handles_valid_png_both_ways(spark):
    png = _make_png(_PIXELS)
    garbage = b"\x01\x02\x03\x04"
    df = spark.createDataFrame(
        [(1, "image/png", bytearray(png)), (2, "image/png", bytearray(garbage))],
        "doc_id long, media_type string, payload binary",
    )
    out = {r.doc_id: r for r in decode_media(df).collect()}

    # undecodable payload always takes the byte-stats fallback
    assert out[2].feat_mean == (1 + 2 + 3 + 4) / 4.0
    assert out[2].feat_first == 1.0
    assert out[2].byte_len == 4

    assert out[1].byte_len == len(png)
    if HAVE_PIL:
        # real decode: pixel statistics of the decoded image
        assert out[1].feat_mean == _PIXEL_MEAN
        assert out[1].feat_first == _PIXEL_FIRST
    else:
        # this container: deterministic byte statistics of the file
        assert out[1].feat_mean == sum(png) / len(png)
        assert out[1].feat_first == float(png[0])


def test_png_fixture_is_well_formed():
    """The fixture itself must be a structurally valid PNG (signature,
    chunk lengths, CRCs) — so the HAVE_PIL branch of the contract test
    is exercised against a genuinely decodable image, not rescued by
    the fallback."""
    png = _make_png(_PIXELS)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    off, seen = 8, []
    while off < len(png):
        (length,) = struct.unpack(">I", png[off : off + 4])
        tag = png[off + 4 : off + 8]
        data = png[off + 8 : off + 8 + length]
        (crc,) = struct.unpack(
            ">I", png[off + 8 + length : off + 12 + length]
        )
        assert crc == zlib.crc32(tag + data) & 0xFFFFFFFF, tag
        seen.append(tag)
        off += 12 + length
    assert seen == [b"IHDR", b"IDAT", b"IEND"]
    # the IDAT stream must decompress to h rows of (filter byte + w px)
    # IDAT data: skip sig(8) + IHDR chunk(25) + IDAT len/tag(8); strip
    # IDAT crc(4) + IEND chunk(12) from the tail
    idat = zlib.decompress(png[8 + 25 + 8 : -16])
    assert len(idat) == len(_PIXELS) * (1 + len(_PIXELS[0]))
