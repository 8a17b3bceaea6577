"""MemorySaver pause/resume roundtrip (reference: torch_memory_saver tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.memsaver import MemorySaver


def test_pause_resume_roundtrip(rng):
    ms = MemorySaver()
    tree = {"w": jnp.asarray(rng.standard_normal((64, 64)), jnp.float32),
            "b": jnp.asarray(rng.standard_normal(64), jnp.float32)}
    ref = jax.tree.map(np.asarray, tree)
    with ms.region(tag="weights"):
        ms.track(tree)
    ms.pause("weights")
    assert ms.get("weights") is None
    restored = ms.resume("weights")
    for k in tree:
        np.testing.assert_array_equal(np.asarray(restored[k]), ref[k])


def test_pause_without_backup_requires_values(rng):
    ms = MemorySaver()
    t = {"x": jnp.ones((8,))}
    ms.track(t, tag="kv")
    ms.pause("kv", backup=False)
    try:
        ms.resume("kv")
        raised = False
    except ValueError:
        raised = True
    assert raised
    restored = ms.resume("kv", values={"x": jnp.full((8,), 2.0)})
    assert float(restored["x"][0]) == 2.0
