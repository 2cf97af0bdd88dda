#!/usr/bin/env python
"""Strip optimizer state and sha256-stamp a checkpoint for release
(reference: tools/publish_model.py).

Works on torch .pth checkpoints (drops 'optimizer') and on orbax train
states (keeps params+batch_stats only, re-saved next to the input).
"""

import argparse
import hashlib
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def process_torch(in_file, out_file):
    import torch
    ckpt = torch.load(in_file, map_location='cpu', weights_only=False)
    if isinstance(ckpt, dict) and 'optimizer' in ckpt:
        del ckpt['optimizer']
    torch.save(ckpt, out_file)
    return out_file


def process_orbax(in_dir, out_dir):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.abspath(in_dir))
    slim = {k: state[k] for k in ('params', 'batch_stats') if k in state}
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    ckptr.save(os.path.abspath(out_dir), slim)
    ckptr.wait_until_finished()
    return out_dir


def sha256_of(path):
    h = hashlib.sha256()
    if os.path.isdir(path):
        for root, _, files in sorted(os.walk(path)):
            for f in sorted(files):
                with open(os.path.join(root, f), 'rb') as fh:
                    h.update(fh.read())
    else:
        with open(path, 'rb') as fh:
            h.update(fh.read())
    return h.hexdigest()[:8]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('in_path')
    parser.add_argument('out_path')
    args = parser.parse_args()
    if os.path.isdir(args.in_path):
        out = process_orbax(args.in_path, args.out_path)
        stamp = sha256_of(out)
        final = f'{out.rstrip("/")}-{stamp}'
        os.rename(out, final)
    else:
        out = process_torch(args.in_path, args.out_path)
        stamp = sha256_of(out)
        root, ext = os.path.splitext(out)
        final = f'{root}-{stamp}{ext}'
        os.rename(out, final)
    print(f'published: {final}')


if __name__ == '__main__':
    main()
