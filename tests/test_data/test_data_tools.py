"""Data-prep tooling: split parsers, file-list building, proposal
denormalization (reference tools/data/{parse_file_list,build_file_list,
denormalize_proposal_file}.py)."""

import json
import os
import os.path as osp
import subprocess
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, REPO)

from tools.data.file_lists import (SPLIT_PARSERS, format_lines,  # noqa
                                   lines_to_records, parse_directory,
                                   scan_videos)


def make_rawframes(root, videos, n_frames=4, prefix='img_'):
    for vid in videos:
        d = osp.join(root, vid)
        os.makedirs(d, exist_ok=True)
        for i in range(1, n_frames + 1):
            open(osp.join(d, f'{prefix}{i:05d}.jpg'), 'w').write('x')


def test_parse_directory_and_format_lines(tmp_path):
    root = str(tmp_path / 'rawframes')
    make_rawframes(root, ['ClassA/vid1', 'ClassB/vid2'], n_frames=5)
    info = parse_directory(root, level=2)
    assert info['ClassA/vid1'][1] == 5
    assert info['ClassA/vid1'][2] == 0  # no flow
    lines = format_lines([('ClassA/vid1', 0), ('ClassB/vid2', 1),
                          ('missing/vid', 2)], info)
    assert lines == ['ClassA/vid1 5 0\n', 'ClassB/vid2 5 1\n']
    # multi-label
    lines = format_lines([('ClassA/vid1', [1, 3])], info)
    assert lines == ['ClassA/vid1 5 1 3\n']
    recs = lines_to_records(lines, 'rawframes')
    assert recs == [dict(frame_dir='ClassA/vid1', total_frames=5,
                         label=[1, 3])]


def test_scan_videos(tmp_path):
    root = str(tmp_path / 'videos')
    os.makedirs(osp.join(root, 'ClassA'))
    open(osp.join(root, 'ClassA', 'v1.mp4'), 'w').write('x')
    info = scan_videos(root, level=2)
    assert info == {'ClassA/v1': ('ClassA/v1.mp4', -1, -1)}


def test_ucf101_split_parser(tmp_path):
    ann = tmp_path / 'annotations'
    ann.mkdir()
    (ann / 'classInd.txt').write_text('1 ApplyEyeMakeup\n2 Archery\n')
    for i in (1, 2, 3):
        (ann / f'trainlist{i:02d}.txt').write_text(
            'ApplyEyeMakeup/v_A_g01_c01.avi 1\nArchery/v_B_g01_c01.avi 2\n')
        (ann / f'testlist{i:02d}.txt').write_text(
            'Archery/v_B_g02_c01.avi\n')
    splits = SPLIT_PARSERS['ucf101'](str(tmp_path), level=2)
    assert len(splits) == 3
    train, test = splits[0]
    assert ('ApplyEyeMakeup/v_A_g01_c01', 0) in train
    assert ('Archery/v_B_g01_c01', 1) in train
    assert test == [('Archery/v_B_g02_c01', 1)]
    # level=1 (flat video dirs) must still emit class IDS, not paths
    train1, test1 = SPLIT_PARSERS['ucf101'](str(tmp_path), level=1)[0]
    assert ('v_A_g01_c01', 0) in train1
    assert ('v_B_g01_c01', 1) in train1
    assert test1 == [('v_B_g02_c01', 1)]


def test_hmdb51_split_parser(tmp_path):
    ann = tmp_path / 'annotations'
    ann.mkdir()
    for i in (1, 2, 3):
        (ann / f'brush_hair_test_split{i}.txt').write_text(
            'a.avi 1\nb.avi 2\nc.avi 0\n')
        (ann / f'walk_test_split{i}.txt').write_text('d.avi 1\n')
    splits = SPLIT_PARSERS['hmdb51'](str(tmp_path), level=2)
    assert len(splits) == 3
    train, test = splits[0]
    assert ('brush_hair/a', 0) in train
    assert ('walk/d', 1) in train
    assert test == [('brush_hair/b', 0)]


def test_kinetics_split_parser(tmp_path):
    ann = tmp_path / 'annotations'
    ann.mkdir()
    header = 'label,youtube_id,time_start,time_end,split,is_cc\n'
    (ann / 'kinetics_train.csv').write_text(
        header + '"abseiling",xxx,0,10,train,0\n'
        'zumba,yyy,5,15,train,0\n')
    (ann / 'kinetics_val.csv').write_text(
        header + 'zumba,zzz,1,11,val,0\n')
    (ann / 'kinetics_test.csv').write_text(
        header + ',qqq,2,12,test,0\n')
    (splits,) = [SPLIT_PARSERS['kinetics400'](str(tmp_path), level=1)][0]
    train, val, test = splits
    assert ('xxx_000000_000010', 0) in train
    assert ('yyy_000005_000015', 1) in train
    assert val == [('zzz_000001_000011', 1)]
    assert test == [('qqq_000002_000012', -1)]


def test_sthv2_split_parser(tmp_path):
    ann = tmp_path / 'annotations'
    ann.mkdir()
    (ann / 'something-something-v2-labels.json').write_text(
        json.dumps({'Doing thing': '0', 'Other thing': '1'}))
    (ann / 'something-something-v2-train.json').write_text(json.dumps(
        [dict(id='1', template='Doing [thing]')]))
    (ann / 'something-something-v2-validation.json').write_text(json.dumps(
        [dict(id='2', template='Other [thing]')]))
    (ann / 'something-something-v2-test.json').write_text(json.dumps(
        [dict(id='3')]))
    (splits,) = SPLIT_PARSERS['sthv2'](str(tmp_path), level=1)
    assert splits[0] == [('1', 0)]
    assert splits[1] == [('2', 1)]
    assert splits[2] == [('3', -1)]


def test_build_file_list_cli(tmp_path):
    data_root = tmp_path / 'ucf101'
    ann = data_root / 'annotations'
    ann.mkdir(parents=True)
    (ann / 'classInd.txt').write_text('1 ClassA\n')
    for i in (1, 2, 3):
        (ann / f'trainlist{i:02d}.txt').write_text('ClassA/vid1.avi 1\n')
        (ann / f'testlist{i:02d}.txt').write_text('ClassA/vid2.avi\n')
    frames = data_root / 'rawframes'
    make_rawframes(str(frames), ['ClassA/vid1', 'ClassA/vid2'], n_frames=3)
    out_root = tmp_path / 'out'
    rc = subprocess.run(
        [sys.executable, osp.join(REPO, 'tools/data/build_file_list.py'),
         'ucf101', str(frames), '--data-root', str(data_root),
         '--level', '2', '--out-root-path', str(out_root) + '/'],
        capture_output=True, text=True)
    assert rc.returncode == 0, rc.stderr
    train1 = (out_root / 'ucf101' /
              'ucf101_train_split_1_rawframes.txt').read_text()
    assert train1 == 'ClassA/vid1 3 0\n'
    val1 = (out_root / 'ucf101' /
            'ucf101_val_split_1_rawframes.txt').read_text()
    assert val1 == 'ClassA/vid2 3 0\n'


def test_denormalize_proposal_file(tmp_path):
    from tools.data.denormalize_proposal_file import denormalize
    norm = tmp_path / 'normalized_props.txt'
    norm.write_text('# 0\nvideo_x\n1\n1\n1\n'
                    '3 0.25 0.75\n'
                    '1\n'
                    '3 0.9000 0.8000 0.2 0.5\n')
    frames = tmp_path / 'rawframes'
    make_rawframes(str(frames), ['video_x'], n_frames=100)
    from tools.data.file_lists import parse_directory as pd
    out = denormalize(str(norm), pd(str(frames), level=1),
                      out_file=str(tmp_path / 'props.txt'))
    text = open(out).read()
    assert 'video_x\n100\n1\n1\n3 25 75\n1\n3 0.9000 0.8000 20 50\n' in text
    # roundtrip through the framework loader
    from vfs_tpu.localization import load_localize_proposal_file
    infos = load_localize_proposal_file(out)
    assert infos[0][0] == 'video_x'
    assert infos[0][2] == [['3', '25', '75']]


def test_trackingnet_reducer(tmp_path):
    chunk = tmp_path / 'TRAIN_0'
    seq = chunk / 'frames' / 'seq1'
    seq.mkdir(parents=True)
    (chunk / 'anno').mkdir()
    for i in range(10):
        (seq / f'{i}.jpg').write_text('x')
    (chunk / 'anno' / 'seq1.txt').write_text(
        ''.join(f'{i},{i},10,10\n' for i in range(10)))
    rc = subprocess.run(
        [sys.executable,
         osp.join(REPO, 'tools/data/trackingnet/reduce_trackingnet.py'),
         str(chunk), '--stride', '4', '--out', str(tmp_path / 'out')],
        capture_output=True, text=True)
    assert rc.returncode == 0, rc.stderr
    kept = sorted(os.listdir(tmp_path / 'out' / 'frames' / 'seq1'))
    assert len(kept) == 3  # frames 0, 4, 8
    anno = (tmp_path / 'out' / 'anno' / 'seq1.txt').read_text().splitlines()
    assert anno == ['0,0,10,10', '4,4,10,10', '8,8,10,10']
