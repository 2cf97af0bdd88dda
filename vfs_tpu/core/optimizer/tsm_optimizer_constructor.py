"""Per-parameter-group optimizer construction (optax.multi_transform).

Reference: mmaction/core/optimizer/tsm_optimizer_constructor.py:7-116. In
JAX, param groups become a label pytree feeding ``optax.multi_transform``;
the TSM policy is expressed over parameter PATHS (flax trees have no
module types at optimization time):

  1. the first conv's kernel/bias: base lr / base wd;
  2. BatchNorm scales/biases: base lr, zero wd;
  3. with ``fc_lr5``: the cls_head fc kernel 5x lr + 10x wd, its bias
     10x lr, zero wd;
  4. other kernels: base lr/wd; other biases: 2x lr, zero wd.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax


def tsm_param_labels(params: Dict, fc_lr5: bool = True) -> Dict:
    """Label each leaf with its TSM group name."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    # find the first conv kernel (document order) and the last fc kernel
    paths = ['/'.join(str(getattr(k, 'key', k)) for k in path)
             for path, _ in flat]

    def is_bn(p):
        return '/bn/' in p or p.endswith('/bn/scale') or \
            p.endswith('/bn/bias') or 'bn' in p.split('/')[-2:][0]

    conv_kernel_paths = [p for p in paths
                         if p.endswith('kernel') and not is_bn(p)]
    first_conv = conv_kernel_paths[0] if conv_kernel_paths else None
    fc_paths = [p for p in paths if 'fc_cls' in p or 'cls_head' in p]
    fc_kernel = next((p for p in fc_paths if p.endswith('kernel')), None)
    fc_bias = next((p for p in fc_paths if p.endswith('bias')), None)

    def label(path, leaf):
        p = '/'.join(str(getattr(k, 'key', k)) for k in path)
        if is_bn(p):
            return 'bn'
        if first_conv is not None and p.startswith(
                first_conv.rsplit('/', 1)[0]):
            return 'first_conv_weight' if p.endswith('kernel') \
                else 'first_conv_bias'
        if fc_lr5 and p == fc_kernel:
            return 'lr5_weight'
        if fc_lr5 and p == fc_bias:
            return 'lr10_bias'
        if p.endswith('bias'):
            return 'normal_bias'
        return 'normal_weight'

    return jax.tree_util.tree_map_with_path(label, params)


def build_tsm_optimizer(params: Dict, lr, momentum: float = 0.9,
                        weight_decay: float = 1e-4,
                        fc_lr5: bool = True) -> optax.GradientTransformation:
    """TSM param-group optimizer (group -> (lr_mult, wd_mult) per the
    reference policy)."""
    groups = {
        'first_conv_weight': (1.0, 1.0),
        'first_conv_bias': (2.0, 0.0),
        'normal_weight': (1.0, 1.0),
        'normal_bias': (2.0, 0.0),
        'bn': (1.0, 0.0),
        'lr5_weight': (5.0, 10.0),
        'lr10_bias': (10.0, 0.0),
    }

    def make_tx(lr_mult, wd_mult):
        chain = []
        if weight_decay * wd_mult:
            chain.append(optax.add_decayed_weights(weight_decay * wd_mult))
        if momentum:
            chain.append(optax.trace(decay=momentum))
        if callable(lr):
            chain.append(optax.scale_by_learning_rate(
                lambda step: lr(step) * lr_mult))
        else:
            chain.append(optax.scale_by_learning_rate(lr * lr_mult))
        return optax.chain(*chain)

    transforms = {name: make_tx(lm, wm)
                  for name, (lm, wm) in groups.items()}
    labels = tsm_param_labels(params, fc_lr5=fc_lr5)
    return optax.multi_transform(transforms, labels)


class CopyOfSGD:
    """Example custom optimizer registration point (reference
    core/optimizer/copy_of_sgd.py — a verbatim SGD clone demonstrating the
    optimizer registry). In optax terms: the standard sgd chain."""

    def __new__(cls, learning_rate, momentum=0.0, weight_decay=0.0,
                nesterov=False):
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=nesterov))
        chain.append(optax.scale_by_learning_rate(learning_rate))
        return optax.chain(*chain)
