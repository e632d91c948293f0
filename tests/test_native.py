"""Native kernels vs oracle: CRC, RLE1 collect, retrieve, IBWT/emit, and
the production decoder over the adversarial corpus."""

import bz2
import glob
import pathlib

import numpy as np
import pytest

from lbzip2_tpu import native

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="no C compiler")


def test_crc_matches():
    from lbzip2_tpu.core import crc32
    rng = np.random.default_rng(0)
    for n in [0, 1, 7, 8, 9, 1000, 99999]:
        d = rng.integers(0, 256, n, dtype=np.uint8)
        assert native.crc32_block(d) == crc32.crc_block(d)


@pytest.mark.parametrize("mbs,granul", [(100000, 100000), (100000, None),
                                        (900000, 900000)])
def test_rle1_collect_matches(mbs, granul):
    from lbzip2_tpu.ref import rle1
    rng = np.random.default_rng(1)
    datas = [
        rng.integers(0, 5, 350000, dtype=np.uint8),
        np.frombuffer(b"q" * 99998 + b"zz" + b"q" * 300, np.uint8),
        np.frombuffer(b"a" * 600000, np.uint8),
        np.zeros(0, np.uint8),
    ]
    for buf in datas:
        cb = native.rle1_collect(buf, mbs, granul)
        pb = rle1.rle1_blocks(buf, mbs, -1 if granul else None)
        assert len(cb) == len(pb)
        for (s, e, bbytes, cm), p in zip(cb, pb):
            assert (s, e) == (p.start, p.end)
            np.testing.assert_array_equal(bbytes, p.data)
            np.testing.assert_array_equal(cm, p.cmap)


def test_production_decoder_roundtrip():
    from lbzip2_tpu.codec.decoder import decompress
    rng = np.random.default_rng(2)
    for data in [b"", b"x", b"hello " * 1000,
                 rng.integers(0, 256, 50000, dtype=np.uint8).tobytes(),
                 b"r" * 300000]:
        assert decompress(bz2.compress(data, 9)) == data
        assert decompress(bz2.compress(data, 1)) == data


def test_production_decoder_corpus():
    from lbzip2_tpu.codec.decoder import decompress
    from lbzip2_tpu.ref.decoder import decompress as ref_dec
    from lbzip2_tpu.core.constants import StreamError
    corpus = sorted(glob.glob("/root/reference/tests/*.bz2"))
    if not corpus:
        pytest.skip("no corpus")
    for f in corpus:
        raw = pathlib.Path(f).read_bytes()
        try:
            expect = ref_dec(raw)
            ok = True
        except StreamError as e:
            ok = False
            code = e.code
        if ok:
            assert decompress(raw) == expect, f
        else:
            with pytest.raises(StreamError) as ei:
                decompress(raw)
            assert ei.value.code == code, f


def test_encode_payload_from_tokens_matches_bytes():
    """Token-direct entropy (device download format) is bit-identical
    to the byte-row path."""
    if not native.native_available():
        pytest.skip("no native lib")
    rng = np.random.default_rng(7)
    for n in (1, 5, 1000, 90001):
        # synthetic BWT-ish row with runs
        vals = rng.integers(0, 5, n // 3 + 1)
        reps = rng.integers(1, 9, n // 3 + 1)
        row = np.repeat(vals, reps)[:n].astype(np.uint8) + 97
        if row.size < n:
            row = np.pad(row, (0, n - row.size), constant_values=97)
        cmap = np.zeros(256, np.uint8)
        cmap[np.unique(row)] = 1
        # tokenize: run starts, split at 255
        starts = [0]
        for i in range(1, n):
            if row[i] != row[i - 1] or i - starts[-1] >= 255:
                starts.append(i)
        toks = []
        for s, e in zip(starts, starts[1:] + [n]):
            toks.append((int(row[s]) << 8) | (e - s))
        toks = np.array(toks, np.uint16)
        a = native.encode_payload_bytewise(row, cmap, 0, 0x1234, 8)
        a2 = native.encode_payload(row, cmap, 0, 0x1234, 8)
        assert a == a2
        b = native.encode_payload_from_tokens(toks, cmap, 0, 0x1234, 8,
                                              n_bytes=n)
        assert a == b


# ---- itb_bwt differential + adversarial coverage (round-4) ----------


def _itb_cases():
    """Randomized + adversarial inputs for the two-stage B*-subset
    sorter: random, periodic-ish, ramps, near-periodic, and the
    deep-common-prefix paired-deviation pattern that overflowed the
    old fixed-depth mkqsort stack (memory corruption regression)."""
    rng = np.random.default_rng(42)
    cases = []
    # random over several alphabet widths/sizes
    for n, hi in ((3, 3), (64, 2), (1000, 4), (20000, 256), (90000, 16)):
        cases.append(rng.integers(0, hi, n).astype(np.uint8))
    # text-like
    cases.append(np.frombuffer(
        (b"the quick brown fox jumps over the lazy dog. " * 2000), np.uint8))
    # near-periodic (periodic with sparse breaks)
    p = np.tile(np.frombuffer(b"abcabd", np.uint8), 15000).copy()
    p[::7919] = ord("z")
    cases.append(p)
    # long ascending ramps (many long identical B* substrings)
    ramp = np.arange(1, 201, dtype=np.uint8)
    cases.append(np.tile(ramp, 1200).copy())
    # paired per-depth deviations: copies of a long ramp where, for
    # each depth d, exactly TWO copies carry a deviant byte at offset
    # d.  The old bounded-64 stack segfaulted on this class (advisor
    # round-3 finding): each depth level pushes a 2-element partition
    # without popping, so stack depth grows linearly with the common
    # prefix length.
    L, D = 400, 320
    ncopy = 2 * D + 40
    ramp = (np.arange(L) % 250 + 1).astype(np.uint8)
    body = np.tile(ramp, ncopy).reshape(ncopy, L).copy()
    for i in range(D):
        body[2 * i, 8 + i] = 255
        body[2 * i + 1, 8 + i] = 255
    cases.append(body.reshape(-1).copy())
    return cases


def test_itb_bwt_differential_vs_sais():
    if not native.native_available():
        pytest.skip("no native lib")
    for k, T in enumerate(_itb_cases()):
        R = np.empty(T.size, np.uint8)
        m = native.get_lib().lbz2_lyndon_prep(
            T.ctypes.data_as(__import__("ctypes").c_void_p), T.size,
            R.ctypes.data_as(__import__("ctypes").c_void_p))
        if m < 0:
            continue  # fully periodic: itb path not used
        want = (T.size - m) % T.size
        exp_bwt, exp_idx = native.bwt_sais_rot(R, want)
        try:
            got_bwt, got_idx = native.itb_bwt_rot(R, want)
        except ValueError:
            continue  # no B* suffix: production falls back to SA-IS
        assert got_idx == exp_idx, f"case {k}: idx"
        assert np.array_equal(got_bwt, exp_bwt), f"case {k}: bwt"


def test_itb_bwt_deep_stack_roundtrip():
    """End-to-end compress of the paired-deviation pattern through the
    production path (the old code segfaulted here)."""
    if not native.native_available():
        pytest.skip("no native lib")
    from lbzip2_tpu.parallel.encode import compress_parallel
    L, D = 400, 320
    ncopy = 2 * D + 40
    ramp = (np.arange(L) % 250 + 1).astype(np.uint8)
    body = np.tile(ramp, ncopy).reshape(ncopy, L).copy()
    for i in range(D):
        body[2 * i, 8 + i] = 255
        body[2 * i + 1, 8 + i] = 255
    data = body.reshape(-1).tobytes()
    out = compress_parallel(data, level=9, n_workers=2)
    assert bz2.decompress(out) == data


def test_rle1_collect_arena_reuse():
    """reuse_arena=True returns views valid until the thread's next
    such call; each call's results must match the owning-copy path,
    and a second call may overwrite the first call's views (the
    documented contract for the hybrid pool's per-stream usage)."""
    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, 250000, dtype=np.uint8)
    b = np.frombuffer(b"x" * 120000 + bytes(rng.integers(0, 256, 130000,
                                            dtype=np.uint8)), np.uint8)
    ra = native.rle1_collect(a, 100000, 100000, reuse_arena=True)
    ca = native.rle1_collect(a, 100000, 100000)
    assert len(ra) == len(ca)
    for (s1, e1, blk1, cm1), (s2, e2, blk2, cm2) in zip(ra, ca):
        assert (s1, e1) == (s2, e2)
        np.testing.assert_array_equal(blk1, blk2)
        np.testing.assert_array_equal(cm1, cm2)
    # second arena call: fresh results correct; prior views now stale
    rb = native.rle1_collect(b, 100000, 100000, reuse_arena=True)
    cb = native.rle1_collect(b, 100000, 100000)
    for (s1, e1, blk1, cm1), (s2, e2, blk2, cm2) in zip(rb, cb):
        assert (s1, e1) == (s2, e2)
        np.testing.assert_array_equal(blk1, blk2)
