"""A/B focal timing with dispatch amortized: one program sums focal over
K=8 distinct P3-shaped logits arrays; per-focal cost = T/K - overhead."""
import sys, time, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp, numpy as np

impl = sys.argv[1] if len(sys.argv) > 1 else "pallas"
if len(sys.argv) > 2:
    import ioudet.ops.focal_pallas as fp
    fp.ROWS = int(sys.argv[2])

from ioudet.models.losses.focal_loss import (fused_level_focal_sum,
                                             _fused_focal_sum_impl)
from ioudet.ops.focal_pallas import focal_level_sum

rng = np.random.default_rng(0)
b, h, w, A, C = 8, 104, 168, 9, 80
K = 8
logits = [jnp.asarray(rng.normal(0, 3, (b, h, w, A * C)), jnp.bfloat16)
          for _ in range(K)]
labels = jnp.asarray(rng.integers(0, C + 1, (b, h * w * A)), jnp.int32)
lw = jnp.asarray(rng.uniform(size=(b, h * w * A)) < 0.7, jnp.float32)

fn1 = (focal_level_sum if impl == "pallas" else _fused_focal_sum_impl)

@jax.jit
def many(c, *xs):
    tot = c
    for x in xs:
        tot = tot + fn1(x + c.astype(jnp.bfloat16) * 0, labels, lw, 2.0, 0.25, A)
    return tot

def timed(fn, args, iters=8, chain=4):
    c = jnp.float32(0.0)
    for _ in range(chain):
        c = fn(c, *args)
    float(c)
    ts = []
    for rep in range(iters // chain):
        t0 = time.perf_counter()
        for _ in range(chain):
            c = fn(c, *args)
        float(c)
        ts.append((time.perf_counter() - t0) / chain)
    return float(np.median(ts)) * 1e3

t = timed(many, logits)
print(impl, sys.argv[2] if len(sys.argv) > 2 else "", "total ms", round(t, 2),
      "per-focal ms", round(t / K, 3))
