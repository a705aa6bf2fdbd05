"""TFRecord codec + Example proto tests (native + python fallback parity)."""
import os
import tempfile

import numpy as np
import pytest

from p3achygo_tpu.data import tfrecord
from p3achygo_tpu.data.example import decode_example, encode_example, make_tf_example


def test_native_lib_builds():
    assert tfrecord.using_native(), "native libtfrecord.so should build"


@pytest.mark.parametrize("zz", [None, 6])
def test_roundtrip(zz):
    recs = [b"hello", b"", b"x" * 100000, bytes(range(256))]
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "test.tfrecord" + (".zz" if zz else ""))
        tfrecord.write_records(path, recs, zlib_level=zz)
        back = list(tfrecord.read_records(path))
    assert back == recs


def test_native_python_wire_parity():
    recs = [b"abc", b"defgh" * 1000]
    with tempfile.TemporaryDirectory() as d:
        p1 = os.path.join(d, "native.tfrecord")
        p2 = os.path.join(d, "python.tfrecord")
        tfrecord.write_records(p1, recs, zlib_level=None)
        tfrecord._py_write(p2, recs, None)
        with open(p1, "rb") as f1, open(p2, "rb") as f2:
            assert f1.read() == f2.read()
        # cross-read
        assert list(tfrecord._py_read(p1)) == recs
        assert list(tfrecord.read_records(p2)) == recs


def test_corruption_detected():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "c.tfrecord")
        tfrecord.write_records(path, [b"payload"], zlib_level=None)
        blob = bytearray(open(path, "rb").read())
        blob[14] ^= 0xFF  # flip a payload byte
        open(path, "wb").write(bytes(blob))
        with pytest.raises(ValueError):
            list(tfrecord.read_records(path))


def test_example_roundtrip():
    ex = encode_example({
        "a_bytes": b"\x01\x02\xff",
        "b_floats": [1.5, -2.0, 0.0],
        "c_ints": [7, 0, 123456789],
    })
    back = decode_example(ex)
    assert back["a_bytes"] == b"\x01\x02\xff"
    assert back["b_floats"] == [1.5, -2.0, 0.0]
    assert back["c_ints"] == [7, 0, 123456789]


def test_make_tf_example_schema():
    z = np.zeros(361, np.int8)
    data = make_tf_example(
        stones=z, last_moves=np.zeros(5, np.int16), stones_atari=z,
        stones_two_lib=z, stones_three_lib=z, stones_ladder=z,
        pi=np.full(362, 1 / 362, np.float32), pi_aux=361,
        pi_aux_dist=np.zeros(362, np.float32), ownership=z,
        score_margin_black=3.5, mcts_value_dist=np.zeros(51, np.uint32),
        q6=0.1, q16=0.2, q50=0.3, q6_score=1.0, q16_score=2.0, q50_score=3.0,
        color=-1, komi=7.5)
    back = decode_example(data)
    expected_keys = {
        "bsize", "board", "last_moves", "stones_atari", "stones_two_liberties",
        "stones_three_liberties", "stones_in_ladder", "color", "komi", "own",
        "pi", "pi_aux", "pi_aux_dist", "mcts_value_dist", "score_margin",
        "q6", "q16", "q50", "q6_score", "q16_score", "q50_score",
    }
    assert set(back.keys()) == expected_keys
    assert len(back["board"]) == 361
    assert len(back["pi"]) == 362 * 4
    # white perspective: margin flipped
    assert back["score_margin"] == [-3.5]
    assert back["q50"] == [pytest.approx(0.3)]


def test_native_streaming_large_chunk(tmp_path):
    """Round-3 streaming rewrite: a multi-MB compressed chunk with
    thousands of records (and one large record forcing buffer growth)
    round-trips through the native reader, which now streams with a
    bounded rolling buffer instead of inflating the whole file."""
    if not tfrecord.using_native():
        pytest.skip("native codec not built")
    rng = np.random.default_rng(0)
    recs = [rng.integers(0, 256, int(rng.integers(50, 4000)),
                         dtype=np.uint8).tobytes() for _ in range(4000)]
    recs.insert(1234, bytes(rng.integers(0, 256, 2_000_000,
                                         dtype=np.uint8)))
    path = str(tmp_path / "big.tfrecord.zz")
    tfrecord.write_records(path, recs, zlib_level=6)
    got = list(tfrecord.read_records(path))
    assert len(got) == len(recs)
    assert got[1234] == recs[1234]
    assert got[0] == recs[0] and got[-1] == recs[-1]
    # python fallback reads the same stream (wire parity under streaming)
    assert list(tfrecord._py_read(path))[:5] == recs[:5]
