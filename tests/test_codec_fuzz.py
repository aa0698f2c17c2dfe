"""Property-based round-trip fuzz for the round-7 container codecs.

Pure Python (no Spark).  The GIF LZW layer and the AVI RIFF walker are
bit-level state machines — hypothesis shrinks any mismatch to a minimal
index stream / frame list, the same discipline the VPA fuzz uses.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from katydid_haskell_spark.operators import multimodal as mm


@settings(max_examples=60, deadline=None)
@given(
    syms=st.lists(st.integers(0, 255), min_size=1, max_size=4000),
    min_code=st.integers(2, 8),
)
def test_lzw_roundtrip_random_streams(syms, min_code):
    """_lzw_encode → _lzw_decode is the identity for any symbol stream
    whose alphabet fits the code size (dictionary growth, width bumps
    and overflow resets all get exercised by long streams)."""
    cap = 1 << min_code
    syms = [s % cap for s in syms]
    out = mm._lzw_decode(mm._lzw_encode(syms, min_code), min_code)
    assert out == syms


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    n_pal=st.integers(2, 256),
    n_frames=st.integers(1, 4),
)
def test_gif_roundtrip_random_images(seed, h, w, n_pal, n_frames):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(n_pal, 3)).astype(np.uint8)
    frames = [rng.integers(0, n_pal, size=(h, w)).astype(np.uint8)
              for _ in range(n_frames)]
    delays = list(rng.integers(0, 100, size=n_frames))
    got, got_delays = mm.decode_gif(
        mm.encode_gif(frames, pal, delays=delays))
    assert got.shape == (n_frames, h, w, 3)
    if n_frames > 1:
        assert got_delays == [int(d) for d in delays]
    for fr, idx in zip(got, frames):
        assert np.array_equal(fr, pal[idx])


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    n_frames=st.integers(1, 5),
    fps=st.integers(1, 60),
)
def test_avi_roundtrip_random_frames(seed, n_frames, fps):
    """encode_avi_mjpeg → decode_avi_frames returns the exact frame
    payload bytes and header meta for random-content JPEG frames."""
    rng = np.random.default_rng(seed)
    frames = [
        mm.encode_jpeg(rng.integers(0, 256, size=(8, 16)).astype(np.uint8))
        for _ in range(n_frames)
    ]
    (got_fps, n, w, h), got = mm.decode_avi_frames(
        mm.encode_avi_mjpeg(frames, fps=fps))
    assert (n, w, h) == (n_frames, 16, 8)
    assert got_fps == 1_000_000 // (1_000_000 // fps)
    assert [bytes(f) for f in got] == [bytes(f) for f in frames]


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    n_recs=st.integers(1, 6),
    compress=st.booleans(),
)
def test_warc_roundtrip_random_records(seed, n_recs, compress):
    """build_warc → parse_warc_records is the identity on types, URIs
    and body bytes for random record lists — including bodies that
    contain WARC-header look-alikes and CRLF runs (framing is
    Content-Length-driven, never delimiter-driven)."""
    import numpy as np

    from katydid_haskell_spark.operators import warc as wr

    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n_recs):
        kind = ["resource", "metadata", "response"][int(rng.integers(3))]
        body = bytes(rng.integers(0, 256, size=int(rng.integers(0, 400)),
                                  dtype=np.uint8))
        if kind == "response":
            body = b"HTTP/1.1 200 OK\r\nX-N: " + str(i).encode() \
                + b"\r\n\r\n" + body
        else:
            # adversarial: embed a fake record header inside the body
            body = b"WARC/1.0\r\nWARC-Type: fake\r\n\r\n" + body
        recs.append({"type": kind, "uri": f"https://x/{i}", "body": body})
    out = wr.parse_warc_records(wr.build_warc(recs, compress=compress))
    assert len(out) == n_recs
    for rec, got in zip(recs, out):
        assert got["type"] == rec["type"]
        assert got["uri"] == rec["uri"]
        assert got["body"] == rec["body"]
        assert got["content_length"] == len(rec["body"])
