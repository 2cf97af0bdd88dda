#!/usr/bin/env python
"""Denormalize a SSN/TAG proposal file: fractional start/end times become
frame indices against the extracted rawframes (reference:
tools/data/denormalize_proposal_file.py:1-82; thumos14 pipeline step).

Usage:
    python tools/data/denormalize_proposal_file.py thumos14 \
        --norm-proposal-file data/thumos14/proposals/..._normalized_...txt \
        --data-prefix data/thumos14/rawframes/validation/
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(
    __file__)))))

from tools.data.file_lists import parse_directory  # noqa: E402
from vfs_tpu.localization import load_localize_proposal_file  # noqa: E402


def denormalize(norm_proposal_file, frame_dict, out_file=None):
    """Rewrite a normalized proposal file with absolute frame numbers.

    Block format per video (shared with SSNDataset's loader):
    ``# idx / frame_dir / num_frames / fps(1) / n_gt / gt lines /
    n_proposals / proposal lines`` where gt = ``label start end`` and
    proposal = ``label best_iou overlap_self start end``.
    """
    out_file = out_file or norm_proposal_file.replace('normalized_', '')
    blocks = []
    for idx, video in enumerate(load_localize_proposal_file(
            norm_proposal_file)):
        video_id = video[0]
        frame_dir, num_frames, _ = frame_dict[video_id]
        gts = [(int(x[0]), int(float(x[1]) * num_frames),
                int(float(x[2]) * num_frames)) for x in video[2]]
        props = [(int(x[0]), float(x[1]), float(x[2]),
                  int(float(x[3]) * num_frames),
                  int(float(x[4]) * num_frames)) for x in video[3]]
        lines = [f'# {idx}', osp.basename(frame_dir), str(num_frames), '1',
                 str(len(gts))]
        lines += ['{} {} {}'.format(*g) for g in gts]
        lines += [str(len(props))]
        lines += ['{} {:.04f} {:.04f} {} {}'.format(*p) for p in props]
        blocks.append('\n'.join(lines) + '\n')
    with open(out_file, 'w') as f:
        f.writelines(blocks)
    return out_file


def main():
    parser = argparse.ArgumentParser(description='Denormalize proposals')
    parser.add_argument('dataset', choices=['thumos14'])
    parser.add_argument('--norm-proposal-file', required=True)
    parser.add_argument('--data-prefix', required=True,
                        help='rawframes directory the proposals refer to')
    args = parser.parse_args()
    frame_dict = parse_directory(args.data_prefix)
    out = denormalize(args.norm_proposal_file, frame_dict)
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
