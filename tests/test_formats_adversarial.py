"""Loud-failure behavior of the from-scratch safetensors reader on corrupt
and adversarial files.

The reference's pure-python fallback reader
(/root/reference/lora_diffusion/safe_open.py:1-68) never validated its
input; this pins the hardening tier the rebuild adds on top: every
corruption class must raise a specific ValueError/TypeError at open time —
never return garbage tensors, never surface an opaque numpy error.
"""

import json

import numpy as np
import pytest

from lora_tpu.formats import reader


@pytest.fixture
def golden(tmp_path):
    """A small valid file to mutate."""
    path = str(tmp_path / "g.safetensors")
    reader.save_file(
        {"a": np.arange(12, dtype=np.float32).reshape(3, 4),
         "b": np.ones((2, 2), dtype=np.float16)},
        path, metadata={"k": "v"})
    return path


def _raw(path):
    with open(path, "rb") as f:
        return bytearray(f.read())


def _write(path, raw):
    with open(path, "wb") as f:
        f.write(bytes(raw))
    return path


def _header_and_data(raw):
    hlen = int.from_bytes(raw[:8], "little")
    return json.loads(raw[8:8 + hlen].decode()), bytes(raw[8 + hlen:])


def _rebuild(path, header, data):
    hjson = json.dumps(header, separators=(",", ":")).encode()
    with open(path, "wb") as f:
        f.write(len(hjson).to_bytes(8, "little"))
        f.write(hjson)
        f.write(data)
    return path


def test_golden_roundtrips(golden):
    tensors, meta = reader.load_file(golden)
    assert meta == {"k": "v"}
    np.testing.assert_array_equal(
        tensors["a"], np.arange(12, dtype=np.float32).reshape(3, 4))


def test_header_length_past_eof(golden):
    raw = _raw(golden)
    raw[0:8] = (2**40).to_bytes(8, "little")
    with pytest.raises(ValueError, match="corrupt safetensors header"):
        reader.SafetensorsFile(_write(golden, raw))


def test_file_shorter_than_length_prefix(tmp_path):
    path = _write(str(tmp_path / "tiny.safetensors"), b"abc")
    with pytest.raises(ValueError, match="length prefix"):
        reader.SafetensorsFile(path)


def test_non_json_header(golden):
    raw = _raw(golden)
    hlen = int.from_bytes(raw[:8], "little")
    raw[8:8 + hlen] = b"{" * hlen
    with pytest.raises(ValueError, match="not valid JSON"):
        reader.SafetensorsFile(_write(golden, raw))


def test_header_not_an_object(tmp_path):
    path = str(tmp_path / "arr.safetensors")
    hjson = json.dumps(["not", "a", "dict"]).encode()
    with open(path, "wb") as f:
        f.write(len(hjson).to_bytes(8, "little"))
        f.write(hjson)
    with pytest.raises(ValueError, match="not an object"):
        reader.SafetensorsFile(path)


def test_truncated_tensor_region(golden):
    raw = _raw(golden)
    with pytest.raises(ValueError, match="truncated or corrupt"):
        reader.SafetensorsFile(_write(golden, raw[:-5]))


def test_unsupported_dtype(golden):
    raw = _raw(golden)
    header, data = _header_and_data(raw)
    header["a"]["dtype"] = "F8_E4M3"
    with pytest.raises(ValueError, match="unsupported safetensors dtype"):
        reader.SafetensorsFile(_rebuild(golden, header, data))


def test_overlapping_offsets(golden):
    raw = _raw(golden)
    header, data = _header_and_data(raw)
    # alias tensor b onto a's byte range (same length: 2x2 f16 = 8 bytes
    # fits inside a's 48) — a classic malicious-kohya-file shape
    header["b"]["data_offsets"] = [4, 12]
    with pytest.raises(ValueError, match="overlapping data ranges"):
        reader.SafetensorsFile(_rebuild(golden, header, data))


def test_shape_bytes_mismatch(golden):
    raw = _raw(golden)
    header, data = _header_and_data(raw)
    header["a"]["shape"] = [3, 5]  # 60 bytes, but offsets still give 48
    with pytest.raises(ValueError, match="needs .* bytes"):
        reader.SafetensorsFile(_rebuild(golden, header, data))


def test_negative_offsets(golden):
    raw = _raw(golden)
    header, data = _header_and_data(raw)
    header["a"]["data_offsets"] = [-48, 0]
    with pytest.raises(ValueError, match="truncated or corrupt"):
        reader.SafetensorsFile(_rebuild(golden, header, data))


def test_non_record_entry(golden):
    raw = _raw(golden)
    header, data = _header_and_data(raw)
    header["evil"] = "just a string"
    with pytest.raises(ValueError, match="not a tensor record"):
        reader.SafetensorsFile(_rebuild(golden, header, data))


def test_bad_shape_type(golden):
    raw = _raw(golden)
    header, data = _header_and_data(raw)
    header["a"]["shape"] = [3, "four"]
    with pytest.raises(ValueError, match="bad shape"):
        reader.SafetensorsFile(_rebuild(golden, header, data))


def test_save_rejects_unsupported_dtype(tmp_path):
    with pytest.raises(TypeError, match="unsupported dtype"):
        reader.save_file(
            {"c": np.zeros(2, dtype=np.complex64)},
            str(tmp_path / "c.safetensors"))


def test_no_fd_leak_on_corrupt_file(golden):
    """__init__ failing after mmap must close the fd (pinned via /proc)."""
    import os
    raw = _raw(golden)
    raw[0:8] = (2**40).to_bytes(8, "little")
    _write(golden, raw)
    fds_before = len(os.listdir("/proc/self/fd"))
    for _ in range(8):
        with pytest.raises(ValueError):
            reader.SafetensorsFile(golden)
    assert len(os.listdir("/proc/self/fd")) <= fds_before
