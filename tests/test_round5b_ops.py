"""Round-5 second-wave operators: GIF/BMP container+decode parsers
and the events-family analytics added after the driver-window repack.
Codec tests are pure-Python (no Ray session needed); query-level tests
replay the oracle law over the sf0.001 parquet inputs."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from alco_ray.pipelines import queries as q


def test_gif_parser_blocks_and_poison():
    """GIF89a block walk: closed-form fixture fields back out (LSD bit
    fields, per-frame Graphic Control delay sum, NETSCAPE loop count,
    local-color-table frames), and malformed streams dead-letter."""
    from alco_ray.stages.multimodal import GifMetaParser, encode_gif_batch

    ids = list(range(45))
    enc = encode_gif_batch(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    parser = GifMetaParser()
    out = parser(enc).to_pylist()
    for i, r in zip(ids, out):
        assert r["decode_ok"] is True
        assert r["width"] == (i % 6 + 1) * 2
        assert r["height"] == (i % 4 + 2) * 2
        assert r["n_frames"] == i % 5 + 1
        assert r["total_delay_cs"] == sum(
            (i * 3 + f) % 100 for f in range(i % 5 + 1))
        assert r["gct_colors"] == 2 << (i % 3)
        assert r["loops"] == (i % 10 if i % 6 == 0 else 0)
    # the rotation really covers loops / comments / local tables
    assert any(b"NETSCAPE2.0" in enc["payload"][i].as_py() for i in ids)
    assert any(b"\x21\xfe" in enc["payload"][i].as_py() for i in ids)

    good = enc["payload"][3].as_py()
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "payload": pa.array(
            [good[:-1],            # missing trailer
             good + b"x",          # bytes after trailer
             b"GIF89a",            # truncated LSD
             b"NOTAGIF" + good,    # bad magic
             b""], pa.binary()),
    })
    got = parser(batch).to_pylist()
    assert [r["decode_ok"] for r in got] == [False] * 5
    assert got[0]["n_frames"] is None


def test_bmp_decoder_stride_flip_and_poison():
    """24-bit BMP decode: exact floor channel means under the per-row
    gradient, the TOP-LEFT pixel witnesses the bottom-up flip (ids
    with id%3 == 0 store top-down), and malformed headers
    dead-letter."""
    import struct

    from alco_ray.stages.multimodal import BmpDecoder, encode_bmp_batch

    ids = list(range(36))
    enc = encode_bmp_batch(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    dec = BmpDecoder()
    out = dec(enc).to_pylist()
    for i, r in zip(ids, out):
        h = (i % 5 + 1) * 2
        assert r["decode_ok"] is True
        assert r["width"] == (i % 7 + 1) * 2 and r["height"] == h
        assert r["mean_r"] == i * 7 % 100 + (h - 1) // 2
        assert r["mean_g"] == i * 3 % 100 + (h - 1) // 2
        assert r["mean_b"] == i % 100 + (h - 1) // 2
        # top row is base + 0 whichever storage order was used
        assert (r["top_r"], r["top_g"], r["top_b"]) == (
            i * 7 % 100, i * 3 % 100, i % 100)
    # both storage orders present (negative biHeight = top-down)
    heights = [struct.unpack_from("<i", enc["payload"][i].as_py(), 22)[0]
               for i in ids]
    assert any(v < 0 for v in heights) and any(v > 0 for v in heights)

    good = enc["payload"][1].as_py()
    bad_bpp = bytearray(good)
    struct.pack_into("<h", bad_bpp, 28, 8)
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "payload": pa.array(
            [good[:40], bytes(bad_bpp), b"XX" + good[2:], b""],
            pa.binary()),
    })
    got = dec(batch).to_pylist()
    assert [r["decode_ok"] for r in got] == [False] * 4
