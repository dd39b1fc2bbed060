"""Weight I/O: safetensors round-trip, bf16 zero-copy views, Q8 layout."""

import os

import numpy as np
import ml_dtypes

from voxtral_tpu.weights import (
    SafetensorsFile, load_params, params_to_safetensors, random_params,
    save_safetensors,
)


def test_safetensors_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "t.safetensors")
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = (np.arange(8) - 4).astype(ml_dtypes.bfloat16).reshape(2, 4)
    save_safetensors(path, {"a": a, "b": b}, metadata={"k": "v"})
    sf = SafetensorsFile(path)
    assert set(sf.names()) == {"a", "b"}
    np.testing.assert_array_equal(sf.tensor("a"), a)
    np.testing.assert_array_equal(sf.tensor("b").astype(np.float32),
                                  b.astype(np.float32))
    assert sf.metadata == {"k": "v"}


def test_q8_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "q.safetensors")
    rng = np.random.RandomState(0)
    w = rng.randn(6, 8).astype(np.float32)
    scales = (np.abs(w).max(axis=1) / 127.0).astype(np.float32)
    q = np.clip(np.round(w / scales[:, None]), -127, 127).astype(np.int8)
    save_safetensors(path, {"w": ("Q8", scales, q, (6, 8))})
    sf = SafetensorsFile(path)
    assert sf.is_q8("w")
    s2, q2 = sf.q8_tensor("w")
    np.testing.assert_array_equal(q2, q)
    np.testing.assert_array_equal(s2, scales)
    np.testing.assert_allclose(sf.tensor_f32("w"), w, atol=scales.max())


def test_bounds_validation_rejects_corrupt_files(tmp_path):
    """Truncated/corrupt safetensors must be rejected at open with a clear
    error, not crash later (voxtral_safetensors.c:272-282 semantics)."""
    import json
    import struct

    import pytest

    path = os.path.join(tmp_path, "t.safetensors")
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    save_safetensors(path, {"a": a})

    # 1. truncated data section
    blob = open(path, "rb").read()
    open(path, "wb").write(blob[:-8])
    with pytest.raises(ValueError, match="out of bounds|size mismatch"):
        SafetensorsFile(path)

    # 2. header declares offsets beyond the file
    def write_with_header(header, data):
        hj = json.dumps(header).encode()
        with open(path, "wb") as f:
            f.write(struct.pack("<Q", len(hj)))
            f.write(hj)
            f.write(data)

    write_with_header(
        {"a": {"dtype": "F32", "shape": [3, 4], "data_offsets": [0, 1 << 20]}},
        a.tobytes())
    with pytest.raises(ValueError, match="out of bounds"):
        SafetensorsFile(path)

    # 3. byte count inconsistent with dtype x shape
    write_with_header(
        {"a": {"dtype": "F32", "shape": [4, 4], "data_offsets": [0, 48]}},
        a.tobytes())
    with pytest.raises(ValueError, match="size mismatch"):
        SafetensorsFile(path)

    # 4. unknown dtype
    write_with_header(
        {"a": {"dtype": "F8_E4M3", "shape": [3, 4], "data_offsets": [0, 12]}},
        a.tobytes()[:12])
    with pytest.raises(ValueError, match="unknown dtype"):
        SafetensorsFile(path)

    # 5. header length field exceeding the file
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", 1 << 30))
        f.write(b"{}")
    with pytest.raises(ValueError, match="header length"):
        SafetensorsFile(path)

    # 6. valid file still opens (guard against over-rejection)
    save_safetensors(path, {"a": a})
    np.testing.assert_array_equal(SafetensorsFile(path).tensor("a"), a)


def test_param_tree_roundtrip(tiny_cfg, tiny_params, tmp_path):
    """Export to reference-layout safetensors and reload: identical tree."""
    path = os.path.join(tmp_path, "model.safetensors")
    params_to_safetensors(tiny_params, tiny_cfg, path)
    reloaded = load_params(path, tiny_cfg, device_put=False)
    for section in ("encoder", "decoder"):
        for i, layer in enumerate(tiny_params[section]["layers"]):
            for key, val in layer.items():
                np.testing.assert_allclose(
                    np.asarray(reloaded[section]["layers"][i][key]),
                    np.asarray(val), atol=1e-6,
                    err_msg=f"{section}.layers.{i}.{key}")
    np.testing.assert_allclose(np.asarray(reloaded["adapter"]["w0"]),
                               np.asarray(tiny_params["adapter"]["w0"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(reloaded["decoder"]["embed"]),
                               np.asarray(tiny_params["decoder"]["embed"]), atol=1e-6)
