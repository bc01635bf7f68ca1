"""Paired A/B of the fused Pallas stem vs the XLA stem on the real TPU.

Run in a FRESH process, quiet window: python tools/stem_bench.py [B]
Prints per-variant medians and writes nothing; the settled number goes
into docs/ARCHITECTURE.md's stem study table.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, args_set, warmup=12, reps=5, iters=5):
    # Same discipline as tools/tpu_smoke.py's timeit (12 warmups, median
    # of reps x iters over DISTINCT inputs) — change both together.
    for i in range(warmup):
        jax.block_until_ready(fn(args_set[i % len(args_set)]))
    meds = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(args_set[i % len(args_set)])
        jax.block_until_ready(out)
        meds.append((time.perf_counter() - t0) / iters)
    return float(np.median(meds))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    print("devices:", jax.devices(), "B =", B)
    from show_tell_tpu.data.transforms import preprocess_images
    from show_tell_tpu.models.resnet import BN_EPS, _max_pool_3x3s2, init_resnet_params
    from show_tell_tpu.ops.stem_pallas import prepare_stem, stem_fused_pallas

    rng = np.random.RandomState(0)
    params, state = init_resnet_params(jax.random.PRNGKey(0), 101)
    imgs = [
        jnp.asarray(rng.randint(0, 255, (B, 224, 224, 3), dtype=np.uint8)) for _ in range(3)
    ]

    bf = jnp.bfloat16
    mult = params["bn1.weight"] * jax.lax.rsqrt(state["bn1.running_var"] + BN_EPS)
    w1 = (params["conv1.weight"] * mult[None, None, None, :]).astype(bf)
    b1 = (params["bn1.bias"] - state["bn1.running_mean"] * mult).astype(jnp.float32)

    @jax.jit
    def xla_stem(u8):
        x = preprocess_images(u8, jax.random.PRNGKey(0), augment=False, dtype=bf)
        h = jax.lax.conv_general_dilated(
            x, w1, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return _max_pool_3x3s2(jax.nn.relu(h + b1).astype(bf))

    prepared = prepare_stem(params, state, dtype=bf)
    fused = jax.jit(lambda u8: stem_fused_pallas(u8, prepared, pool=True, interpret=False))

    a = np.asarray(xla_stem(imgs[0]), np.float32)
    b = np.asarray(fused(imgs[0]), np.float32)
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
    print("correctness: maxdiff %.3e (rel %.3e) over |max| %.2f" % (np.abs(a - b).max(), rel, np.abs(a).max()))

    t_x = timeit(xla_stem, imgs)
    t_p = timeit(fused, imgs)
    print("xla stem    %.3f ms" % (t_x * 1e3))
    print("fused stem  %.3f ms   (%.2fx)" % (t_p * 1e3, t_x / t_p))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
