#!/usr/bin/env python
"""FLOPs/params counter via XLA cost analysis (reference:
tools/analysis/get_flops.py used the mmcv counter; XLA's own
``compiled.cost_analysis()`` is exact for the compiled graph).

Usage:
    python tools/analysis/get_flops.py CONFIG [--shape 224 224]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('config')
    parser.add_argument('--shape', type=int, nargs='+', default=[224, 224])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from vfs_tpu.models import build_backbone
    from vfs_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    backbone = build_backbone(dict(cfg.model.backbone))
    h, w = args.shape if len(args.shape) == 2 else (args.shape[0],
                                                    args.shape[0])
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = backbone.init(jax.random.PRNGKey(0), x, train=False)
    n_params = sum(p.size for p in jax.tree.leaves(variables['params']))

    fwd = jax.jit(lambda v, x: backbone.apply(v, x, train=False))
    compiled = fwd.lower(variables, x).compile()
    cost = compiled.cost_analysis()
    flops = cost.get('flops', float('nan'))
    print(f'Input shape: (1, {h}, {w}, 3)')
    print(f'Params: {n_params / 1e6:.2f} M')
    print(f'FLOPs: {flops / 1e9:.2f} GFLOPs (XLA cost analysis)')
    print(f'Bytes accessed: {cost.get("bytes accessed", 0) / 1e6:.1f} MB')


if __name__ == '__main__':
    main()
