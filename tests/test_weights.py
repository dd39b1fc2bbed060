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
