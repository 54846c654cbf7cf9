"""TPU smoke lane: tiny on-hardware kernel-lowering + parity gate.

Interpret-mode tests can't see Mosaic lowering rules (docs/PERF_NOTES.md:
the %128 gate and the batched-MoE block shapes were both broken ON HARDWARE
ONLY while the CPU suite stayed green). This script runs the real kernels
on the attached TPU in under a couple of minutes:

  - every weight format (fp16 / fp8 / fp8e4 / gf4) decodes through its fast
    path (Pallas or fused-XLA) on llama- and llama2-geometry shapes, B=1
    and B=4, plus a gf4 MoE model (dense unique-expert kernel)
  - each result is cross-checked against the jnp reference path
    (enable_pallas(False)) to ~1e-2 — a silently-wrong fast path fails
  - greedy decode hash must be identical across two runs (determinism)

Run: make tpu-smoke   (or: python tools/tpu_smoke.py)
Exit code 0 = all clear.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from calm_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
import numpy as np  # noqa: E402

from calm_tpu import model as M  # noqa: E402
from calm_tpu.config import ModelConfig  # noqa: E402
from calm_tpu.ops import qmm  # noqa: E402
from calm_tpu.utils.synth import synth_weights  # noqa: E402


# TPU-backend golden greedy-decode fingerprints, pinned per device kind
# (the CPU suite's matrix in tests/test_golden.py cannot see a hardware
# numerics regression, e.g. a Mosaic update changing an accumulation —
# the reference re-checks its #hash on-device every sequence,
# /root/reference/src/run.c:242-253). Regenerate after an INTENTIONAL
# numerics change: run this script and copy the printed hashes.
GOLDEN_TPU = {
    "TPU v5 lite": {
        "fp16 hidden=512 B=1": 0xa1f5bcd0,
        "fp16 hidden=512 B=4": 0xee8145b8,
        "fp8 hidden=512 B=1": 0x10814e00,
        "fp8 hidden=512 B=4": 0x97ac6000,
        "fp8e4 hidden=512 B=1": 0xb3c19c00,
        "fp8e4 hidden=512 B=4": 0xfc8dd000,
        "gf4 hidden=512 B=1": 0x676eeaab,
        "gf4 hidden=512 B=4": 0x2341d30b,
        "gf4 hidden=2752 B=1": 0xe0489b7a,
        "gf4 hidden=2752 B=4": 0x9a8cefa7,
        "gf4 hidden=512 moe B=1": 0xec15bbb5,
        "gf4 hidden=512 moe B=4": 0xfe521dde,
    },
}


def tiny_cfg(dtype: str, hidden: int, moe: bool = False) -> ModelConfig:
    # hidden/8 deliberately NOT lane-aligned for the llama2-geometry case:
    # 344 words — the class of shape the %128 gate silently mis-routed
    kw = dict(n_experts=4, n_experts_ac=2) if moe else {}
    return ModelConfig(dim=256, hidden_dim=hidden, head_dim=64, n_layers=2,
                       n_heads=4, n_kv_heads=2, vocab_size=512, seq_len=64,
                       rope_theta=10000.0, rotary_dim=64, norm_ln=False,
                       dtype=dtype, **kw)


def decode(cfg, w, batch: int, steps: int = 6, kv_dtype=jnp.bfloat16,
           pos0: int = 0):
    cache = M.KVCache.create(cfg, batch, kv_dtype)
    tok = jnp.arange(batch, dtype=jnp.int32) % 7
    pos = jnp.full((batch,), pos0, jnp.int32)
    toks, _, logits = M.decode_scan(
        cfg, w, tok, pos, cache, steps,
        rolling=pos0 + steps >= cfg.seq_len)
    return np.asarray(toks), np.asarray(logits[-1], np.float32)


def update_goldens(device_kind: str, hashes: dict) -> None:
    """Rewrite GOLDEN_TPU[device_kind] in THIS file (the executable regen
    protocol: `python tools/tpu_smoke.py --update` after an INTENTIONAL
    numerics change — e.g. a kernel changing fp accumulation order — then
    commit the diff; a stale pin otherwise fails every later run)."""
    path = os.path.abspath(__file__)
    src = open(path).read()
    start = src.index("GOLDEN_TPU = {")
    end = src.index("\n}\n", start) + 3
    goldens = dict(GOLDEN_TPU)
    goldens[device_kind] = hashes
    lines = ["GOLDEN_TPU = {"]
    for kind, table in sorted(goldens.items()):
        lines.append(f'    "{kind}": {{')
        for tag, h in table.items():
            lines.append(f'        "{tag}": {h:#010x},')
        lines.append("    },")
    lines.append("}\n")
    open(path, "w").write(src[:start] + "\n".join(lines) + src[end:])
    print(f"# GOLDEN_TPU[{device_kind!r}] rewritten with "
          f"{len(hashes)} hashes — commit the diff")


def main() -> int:
    if jax.default_backend() != "tpu":
        print("tpu_smoke: no TPU attached (backend="
              f"{jax.default_backend()}) — nothing to check", file=sys.stderr)
        return 0
    update = "--update" in sys.argv[1:]
    dev = jax.devices()[0]
    print(f"# tpu_smoke on {dev.device_kind}")
    failures = 0
    fresh_hashes = {}

    cases = [
        ("fp16", 512, False), ("fp8", 512, False), ("fp8e4", 512, False),
        ("gf4", 512, False), ("gf4", 2752, False),  # 2752/8=344: unaligned
        ("gf4", 512, True),  # MoE dense unique-expert kernel
    ]
    for dtype, hidden, moe in cases:
        for batch in (1, 4):
            tag = f"{dtype} hidden={hidden}{' moe' if moe else ''} B={batch}"
            cfg = tiny_cfg(dtype, hidden, moe)
            w = M.fuse_gf4_weights(synth_weights(cfg), cfg)
            try:
                qmm.enable_pallas(True)
                toks_fast, logits_fast = decode(cfg, w, batch)
                toks_fast2, logits_fast2 = decode(cfg, w, batch)
                qmm.enable_pallas(False)
                toks_ref, logits_ref = decode(cfg, w, batch)
            except Exception as e:  # noqa: BLE001 — report, keep sweeping
                print(f"FAIL {tag}: {type(e).__name__}: {e}")
                failures += 1
                continue
            finally:
                qmm.enable_pallas(jax.default_backend() == "tpu")
            h1 = M.logits_hash(logits_fast)
            h2 = M.logits_hash(logits_fast2)
            if h1 != h2:
                print(f"FAIL {tag}: nondeterministic hash "
                      f"#{h1:08x} vs #{h2:08x}")
                failures += 1
                continue
            # fast path vs jnp reference: same argmax chain and close logits
            rel = (np.abs(logits_fast - logits_ref)
                   / (np.abs(logits_ref).max() + 1e-6)).max()
            if not np.array_equal(toks_fast, toks_ref) and rel > 5e-2:
                print(f"FAIL {tag}: fast path diverges from reference "
                      f"(max rel err {rel:.3f}, tokens differ)")
                failures += 1
                continue
            # golden gate: pinned on-device fingerprint for this chip kind
            fresh_hashes[tag] = h1
            want = GOLDEN_TPU.get(dev.device_kind, {}).get(tag)
            if update:
                pass  # regen mode: parity/determinism still gate above
            elif want is not None and h1 != want:
                print(f"FAIL {tag}: hash #{h1:08x} != golden #{want:08x} "
                      "(hardware numerics regression — or regenerate "
                      "GOLDEN_TPU after an intentional change)")
                failures += 1
                continue
            gold = "" if want is None else " golden-ok"
            print(f"ok   {tag}  #{h1:08x}  (rel err {rel:.4f}){gold}")

    # fp8 KV (in-kernel decode) + the ROLLING window program (sink rotation
    # lowering) on hardware: decode across the seq_len edge, fast path vs
    # reference
    for dtype, kvd, kvname in (("fp8", jnp.float8_e5m2, "fp8kv"),
                               ("gf4", jnp.bfloat16, "rolling")):
        cfg = tiny_cfg(dtype, 512)
        w = M.fuse_gf4_weights(synth_weights(cfg), cfg)
        pos0 = cfg.seq_len - 3  # crosses the window edge mid-scan
        try:
            qmm.enable_pallas(True)
            toks_fast, logits_fast = decode(cfg, w, 1, kv_dtype=kvd,
                                            pos0=pos0)
            qmm.enable_pallas(False)
            toks_ref, logits_ref = decode(cfg, w, 1, kv_dtype=kvd,
                                          pos0=pos0)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {dtype} {kvname} edge-crossing: "
                  f"{type(e).__name__}: {e}")
            failures += 1
            continue
        finally:
            qmm.enable_pallas(jax.default_backend() == "tpu")
        rel = (np.abs(logits_fast - logits_ref)
               / (np.abs(logits_ref).max() + 1e-6)).max()
        if not np.array_equal(toks_fast, toks_ref) and rel > 5e-2:
            print(f"FAIL {dtype} {kvname} edge-crossing: rel err {rel:.3f}")
            failures += 1
        else:
            print(f"ok   {dtype} {kvname} edge-crossing  (rel err {rel:.4f})")

    # gf4 PREFILL matmul kernels (row-blocked plane-dot + word-transposed
    # w2 variant): must lower on Mosaic and match the pallas-off prefill
    for hidden in (512, 2752):  # 2752/8 = 344: lane-unaligned packed axis
        cfg = tiny_cfg("gf4", hidden)
        w = M.fuse_gf4_weights(synth_weights(cfg), cfg)
        toks = jnp.asarray([list(range(2, 66))], jnp.int32)  # 64 rows
        p0 = jnp.zeros((1,), jnp.int32)
        try:
            qmm.enable_pallas(True)
            cache = M.KVCache.create(cfg, 1, jnp.bfloat16)
            lf, _ = M.prefill(cfg, w, toks, p0, cache, logits_mode="last")
            lf = np.asarray(lf, np.float32)
            qmm.enable_pallas(False)
            cache = M.KVCache.create(cfg, 1, jnp.bfloat16)
            lr, _ = M.prefill(cfg, w, toks, p0, cache, logits_mode="last")
            lr = np.asarray(lr, np.float32)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL gf4 prefill kernel hidden={hidden}: "
                  f"{type(e).__name__}: {e}")
            failures += 1
            continue
        finally:
            qmm.enable_pallas(jax.default_backend() == "tpu")
        rel = (np.abs(lf - lr) / (np.abs(lr).max() + 1e-6)).max()
        if rel > 5e-2:
            print(f"FAIL gf4 prefill kernel hidden={hidden}: rel {rel:.3f}")
            failures += 1
        else:
            print(f"ok   gf4 prefill kernel hidden={hidden} (rel {rel:.4f})")

    # paged KV: the page-table BlockSpec redirect must lower on Mosaic and
    # match the dense path token-for-token
    from calm_tpu import paged as P
    cfg = tiny_cfg("fp8", 512)
    w = synth_weights(cfg)
    qmm.enable_pallas(True)
    try:
        cache = M.KVCache.create(cfg, 1, jnp.bfloat16)
        _, cache = M.prefill(cfg, w, jnp.asarray([[1, 5, 9]], jnp.int32),
                             jnp.zeros((1,), jnp.int32), cache,
                             logits_mode="none")
        tokd, posd, dense_seq = 2, 3, []
        for _ in range(5):
            lg, cache = M.decode_step(cfg, w, jnp.array([tokd]),
                                      jnp.array([posd]), cache)
            tokd = int(np.argmax(np.asarray(lg[0])))
            posd += 1
            dense_seq.append(tokd)

        dec = P.PagedDecoder(cfg, w, n_pages=4, page_rows=32, batch=1)
        assert dec.admit(0, [1, 5, 9, 2])
        paged_seq = []
        for _ in range(5):
            lg = dec.step()
            nxt = int(np.argmax(lg[0]))
            paged_seq.append(nxt)
            dec.slots[0].token = nxt
        if paged_seq == dense_seq:
            print(f"ok   paged kv (page_rows=32)  {paged_seq}")
        else:
            print(f"FAIL paged kv: {paged_seq} != dense {dense_seq}")
            failures += 1
    except Exception as e:  # noqa: BLE001
        print(f"FAIL paged kv: {type(e).__name__}: {e}")
        failures += 1

    if failures:
        print(f"tpu_smoke: {failures} FAILURE(S)", file=sys.stderr)
        return 1
    if update:
        update_goldens(dev.device_kind, fresh_hashes)
    print("tpu_smoke: all clear")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
