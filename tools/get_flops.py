#!/usr/bin/env python
"""Model FLOPs/params report (ref: tools/get_flops.py) via XLA's cost
analysis of the compiled forward."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--shape", type=int, nargs=2, default=[832, 1344])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from ioudet import Config
    from ioudet.models import build_detector

    cfg = Config.fromfile(args.config)
    det = build_detector(dict(cfg.model), cfg.get("train_cfg"),
                         cfg.get("test_cfg"))
    img = jnp.zeros((1, args.shape[0], args.shape[1], 3), jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), img)
    n_params = sum(x.size for x in jax.tree.leaves(variables))

    fwd = jax.jit(lambda v, im: det.apply(v, im))
    lowered = fwd.lower(variables, img)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, list) else cost
        flops = cost.get("flops", float("nan"))
    except Exception:
        flops = float("nan")
    print(f"input shape: (1, {args.shape[0]}, {args.shape[1]}, 3)")
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"flops (fwd): {flops / 1e9:.2f} GFLOPs")


if __name__ == "__main__":
    main()
