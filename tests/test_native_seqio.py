"""Native seqio (C++ mmap container + threaded prefetcher) tests."""

import numpy as np
import pytest

from aruco_slam_tpu.io import native_seqio


pytestmark = pytest.mark.skipif(
    not native_seqio.is_available(), reason="native seqio not built"
)


def test_write_read_roundtrip(tmp_path, rng):
    frames = rng.integers(0, 255, size=(12, 48, 64), dtype=np.uint8)
    path = str(tmp_path / "seq.asq")
    native_seqio.write_frames(path, frames)
    with native_seqio.NativeSequenceReader(path) as r:
        assert (r.n_frames, r.height, r.width) == (12, 48, 64)
        assert r.verify()
        for i in (0, 5, 11):
            np.testing.assert_array_equal(r.read(i), frames[i])


def test_prefetch_in_order(tmp_path, rng):
    frames = rng.integers(0, 255, size=(40, 32, 32), dtype=np.uint8)
    path = str(tmp_path / "seq.asq")
    native_seqio.write_frames(path, frames)
    with native_seqio.NativeSequenceReader(path) as r:
        seen = []
        for idx, frame in r.iter_prefetched(threads=4, queue=4):
            seen.append(idx)
            np.testing.assert_array_equal(frame, frames[idx])
        assert seen == list(range(40))


def test_prefetch_subrange(tmp_path, rng):
    frames = rng.integers(0, 255, size=(20, 16, 16), dtype=np.uint8)
    path = str(tmp_path / "seq.asq")
    native_seqio.write_frames(path, frames)
    with native_seqio.NativeSequenceReader(path) as r:
        idxs = [i for i, _ in r.iter_prefetched(start=5, end=15)]
        assert idxs == list(range(5, 15))


def test_corrupt_file_rejected(tmp_path):
    path = str(tmp_path / "bad.asq")
    with open(path, "wb") as f:
        f.write(b"NOPE" + b"\0" * 100)
    with pytest.raises(IOError):
        native_seqio.NativeSequenceReader(path)


def test_crc_detects_corruption(tmp_path, rng):
    frames = rng.integers(0, 255, size=(4, 8, 8), dtype=np.uint8)
    path = str(tmp_path / "seq.asq")
    native_seqio.write_frames(path, frames)
    with open(path, "r+b") as f:
        f.seek(40)  # somewhere in the payload
        f.write(b"\xff\xff")
    with native_seqio.NativeSequenceReader(path) as r:
        assert not r.verify()
