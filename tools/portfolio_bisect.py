"""Bisect the --portfolio 8 dithered TPU-worker crash (round 5).

tools/batch_portfolio_tpu.py's K=8 dithered portfolio_run reliably
crashes the axon TPU worker ("kernel fault"), while K=2 runs fine and
the identical program passes in interpret mode (tests/test_remap.py
seed-fold tests). Each probe here runs ONE suspect shape in its own
process so a worker crash yields a clean verdict instead of killing a
whole queue step:

  kern_gN  — the dither kernel's seed fold alone (ops/pallas_dither.py),
             N per-seed palettes x b0=33 candidates at the full bench
             image scale (C=8, S=15, 256x256). N=8 reproduces the
             portfolio's (7, 1) sub-fold split; N=7 the single odd
             G=7 / b=231 launch; N=4 the b=132 chunk=8 launch; N=2 the
             known-good K=2 shape.
  k8s1     — full portfolio_run(K=8, max_steps=1), the failing program
             cut to one step.
  k8ref    — portfolio_run(K=8, max_steps=1) on the reference schedule
             (round-3's working shape: random visits b0=65 -> sub-folds
             G=3,3,2).

Each probe prints `PROBE <name> OK <secs>` on success; a worker crash
surfaces as a JaxRuntimeError/process death (rc != 0).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import _test_image
from snesimage_tpu.config import QuantConfig
from snesimage_tpu.utils.cache import enable_compile_cache


def kern_probe(g: int, b0: int = 33):
    from snesimage_tpu.ops.color import expand_5bit_to_8bit
    from snesimage_tpu.ops.dither import _prep_skewed
    from snesimage_tpu.ops.pallas_dither import dither_remap_candidates

    rng = np.random.default_rng(0)
    img = _test_image()
    rgb = jnp.asarray(img[..., :3])
    alpha = jnp.asarray(img[..., 3])
    tp = jnp.asarray(rng.integers(0, 8, (32, 32)).astype(np.int32))
    pals = rng.integers(0, 32, (g, 8, 15, 3)).astype(np.int32)
    cands = rng.integers(0, 32, (g, b0, 3)).astype(np.int32)
    cand8 = expand_5bit_to_8bit(jnp.asarray(cands)).astype(jnp.float32)
    p, i = 3, 7

    orig_sk, _, tp_sk, aff_sk, alpha_sk, xof_sk = _prep_skewed(
        rgb, alpha, tp, jnp.asarray(pals[0]), p
    )[:6]

    def ent_cm(pal):
        e8 = expand_5bit_to_8bit(jnp.asarray(pal)).astype(jnp.float32)
        s = e8.shape[1]
        return jnp.transpose(e8, (0, 2, 1)).reshape(-1, 3 * s)

    ents = jnp.stack([ent_cm(pals[k]) for k in range(g)])

    out = jax.vmap(
        lambda e, c: dither_remap_candidates(
            orig_sk, e, tp_sk, aff_sk, alpha_sk, xof_sk, c, i, img_w=256,
        )
    )(ents, cand8)
    out.block_until_ready()
    # sanity: valid palette-map ids
    mx = int(jnp.max(out))
    assert 0 <= mx < 15, mx
    return out.shape


def portfolio_probe(k: int, schedule: str, steps: int = 1):
    from snesimage_tpu.parallel import batch as pb

    config = QuantConfig(
        subpalette_count=8, subpalette_size=15, dither=True, max_steps=steps,
        converge_tol=0.5, schedule=schedule, prescreen=8, prescreen_full=2,
    )
    img = _test_image()
    _, seed_errs, _ = pb.portfolio_run(img, config, k, max_steps=steps)
    assert np.isfinite(seed_errs).all(), seed_errs
    return seed_errs


def main():
    enable_compile_cache()
    assert jax.default_backend() != "cpu", "bisect needs the TPU"
    name = sys.argv[1]
    t0 = time.perf_counter()
    if name.startswith("kern_g"):
        res = kern_probe(int(name[6:]))
    elif name == "k8s1":
        res = portfolio_probe(8, "channel")
    elif name == "k8ref":
        res = portfolio_probe(8, "reference")
    elif name == "k4s1":
        res = portfolio_probe(4, "channel")
    elif name.startswith("k8ch"):  # k8chN: K=8 channel, N steps
        res = portfolio_probe(8, "channel", int(name[4:]))
    elif name.startswith("k8rf"):  # k8rfN: K=8 reference, N steps
        res = portfolio_probe(8, "reference", int(name[4:]))
    else:
        raise SystemExit(f"unknown probe {name}")
    dt = time.perf_counter() - t0
    print(f"PROBE {name} OK {dt:.1f}s {np.asarray(res)!r}"[:300], flush=True)


if __name__ == "__main__":
    main()
