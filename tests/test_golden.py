"""Golden logits-hash matrix: greedy decode fingerprints per dtype/feature
pinned to committed values — the cross-version regression gate the reference
gets from its printed #hash (src/run.c:242-253). CPU backend; any change to
kernels, layouts, or numerics that shifts a single logit bit trips this.

Regenerate after an INTENTIONAL numerics change:
    python -m tests.test_golden
"""

import jax.numpy as jnp
import numpy as np

from calm_tpu import container
from calm_tpu import model as M

from tests.modelgen import tiny_config, write_tiny_model

TOKENS = [1, 5, 9, 200, 42, 7]

# pinned fingerprints (CPU backend, jax 0.8.x); see module docstring
# NOTE: values are specific to the test harness environment (tests/conftest
# sets an 8-virtual-device CPU platform, which changes XLA's accumulation
# choices) — regenerate with a scratch test under pytest, not plain python.
GOLDEN = {
    "fp16": 0x91cf6ac1,
    "fp8": 0x2c14c43a,
    "fp8e4": 0x3a2f71bd,
    "gf4": 0x7469835,
    "fp16-moe": 0xa1883c0a,
    "fp16-gelu-ln": 0xeab5715f,
}


def _hash_for(name: str, tmp_path) -> int:
    kwargs = {}
    if name.endswith("-moe"):
        kwargs["moe"] = True
    dtype = name.split("-")[0]
    if "gelu-ln" in name:
        kwargs.update(act_gelu=True, norm_ln=True)
    if dtype == "gf4":
        kwargs.update(dim=64, hidden_dim=64, head_dim=16, rotary_dim=16,
                      vocab_size=272)
    cfg = tiny_config(dtype=dtype, **kwargs)
    path = str(tmp_path / f"{name}.calm")
    write_tiny_model(path, cfg)
    tf = container.TensorFile(path)
    w = M.load_weights(tf, cfg)

    cache = M.KVCache.create(cfg, 1, jnp.float16)
    logits = None
    for pos, tok in enumerate(TOKENS):
        logits, cache = M.decode_step(cfg, w, jnp.array([tok]),
                                      jnp.array([pos]), cache)
    return M.logits_hash(np.asarray(logits[0], np.float32))


def test_golden_hashes(tmp_path):
    for name, want in GOLDEN.items():
        if isinstance(want, int):
            got = _hash_for(name, tmp_path)
            assert got == want, (name, hex(got), hex(want))


if __name__ == "__main__":  # regeneration helper
    import pathlib
    import sys
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        for name in ("fp16", "fp8", "fp8e4", "gf4", "fp16-moe",
                     "fp16-gelu-ln"):
            print(f'    "{name}": {hex(_hash_for(name, pathlib.Path(d)))},')
