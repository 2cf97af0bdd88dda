"""SiamFC: xcorr parity vs torch grouped conv, loss parity, and an
end-to-end OTB OPE run on a synthetic moving-square sequence."""

import os
import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

sys.path.insert(0, osp.join(osp.dirname(__file__), '../../projects/siamfc'))

from siamfc_tpu import (ExperimentOTB, TrackerSiamFC, default_cfg,
                        fast_xcorr)  # noqa: E402
from siamfc_tpu.losses import (balanced_loss, create_labels,  # noqa: E402
                               focal_loss)


def torch_fast_xcorr(z, x, out_scale):
    nz = z.size(0)
    nx, c, h, w = x.size()
    x = x.view(-1, nz * c, h, w)
    out = F.conv2d(x, z, groups=nz)
    out = out.view(nx, -1, out.size(-2), out.size(-1))
    return out * out_scale


@pytest.mark.parametrize('nz,nx', [(4, 4), (1, 3)])
def test_xcorr_parity(nz, nx):
    rng = np.random.RandomState(0)
    c, hz, wz, hx, wx = 16, 6, 6, 14, 14
    z = rng.randn(nz, c, hz, wz).astype(np.float32)
    x = rng.randn(nx, c, hx, wx).astype(np.float32)
    ref = torch_fast_xcorr(torch.from_numpy(z), torch.from_numpy(x),
                           0.001).numpy()
    out = fast_xcorr(jnp.asarray(z.transpose(0, 2, 3, 1)),
                     jnp.asarray(x.transpose(0, 2, 3, 1)), 0.001)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_focal_loss_parity():
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 17, 17).astype(np.float32)
    labels = (rng.rand(2, 17, 17) > 0.8).astype(np.float32)
    # torch reference (reference losses.py:44-66)
    inp = torch.from_numpy(logits)
    tgt = torch.from_numpy(labels)
    pos_log = torch.clamp(inp, max=0) - torch.log1p(torch.exp(-inp.abs()))
    neg_log = torch.clamp(-inp, max=0) - torch.log1p(torch.exp(-inp.abs()))
    prob = torch.sigmoid(inp)
    loss = -(tgt * (1 - prob)**2 * pos_log + (1 - tgt) * prob**2 * neg_log)
    avg_w = tgt * (1 - prob)**2 + (1 - tgt) * prob**2
    ref = (loss / avg_w.mean()).mean().item()
    out = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert out == pytest.approx(ref, rel=1e-4)


def test_balanced_loss_values():
    logits = jnp.asarray([[10.0, -10.0], [-10.0, 10.0]])
    labels = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    assert float(balanced_loss(logits, labels)) < 1e-3  # perfect predictions


def test_create_labels():
    labels = create_labels((17, 17), r_pos=16, r_neg=0, total_stride=8)
    assert labels.shape == (17, 17)
    assert labels[8, 8] == 1.0       # center positive
    assert labels[8, 10] == 1.0      # within block distance 2
    assert labels[0, 0] == 0.0


def make_otb_fixture(root, num_frames=12, hw=(120, 160)):
    import cv2
    h, w = hw
    seq = osp.join(root, 'Square', 'img')
    os.makedirs(seq, exist_ok=True)
    rng = np.random.RandomState(0)
    base = rng.randint(0, 50, (h, w, 3), np.uint8)
    boxes = []
    for t in range(num_frames):
        img = base.copy()
        x0, y0 = 30 + 2 * t, 40 + t
        img[y0:y0 + 30, x0:x0 + 30] = [230, 60, 60]
        cv2.imwrite(osp.join(seq, f'{t + 1:04}.jpg'),
                    img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
        boxes.append([x0 + 1, y0 + 1, 30, 30])  # 1-indexed ltwh
    np.savetxt(osp.join(root, 'Square', 'groundtruth_rect.txt'),
               np.array(boxes), fmt='%d', delimiter=',')


def test_otb_experiment_end_to_end(tmp_path):
    make_otb_fixture(str(tmp_path))
    cfg = dict(default_cfg)
    cfg['model'] = {'backbone': dict(type='ResNet', depth=18,
                                     frozen_stages=4,
                                     dilations=(1, 1, 2, 4),
                                     strides=(1, 2, 1, 1),
                                     out_indices=(3,), norm_eval=True)}
    tracker = TrackerSiamFC(cfg)
    tracker.init_weights()
    exp = ExperimentOTB(str(tmp_path),
                        result_dir=str(tmp_path / 'results'),
                        report_dir=str(tmp_path / 'reports'))
    assert exp.seq_names == ['Square']
    boxes = exp.run(tracker)
    report = exp.report(boxes)
    assert 0.0 <= report['success_score'] <= 1.0
    assert 0.0 <= report['precision_score'] <= 1.0
    assert osp.isfile(tmp_path / 'reports' / 'performance.json')
    assert osp.isfile(tmp_path / 'results' / 'Square.txt')


def make_otb_multi_fixture(root, lengths=(12, 9, 7), hw=(120, 160)):
    """Several sequences of DIFFERENT lengths (exercises the straggler
    masking in track_batch)."""
    import cv2
    h, w = hw
    rng = np.random.RandomState(3)
    for s, n in enumerate(lengths):
        seq = osp.join(root, f'Seq{s}', 'img')
        os.makedirs(seq, exist_ok=True)
        base = rng.randint(0, 50, (h, w, 3), np.uint8)
        color = rng.randint(150, 255, 3).tolist()
        boxes = []
        for t in range(n):
            img = base.copy()
            x0, y0 = 30 + s * 5 + 2 * t, 40 - s * 3 + t
            img[y0:y0 + 30, x0:x0 + 30] = color
            cv2.imwrite(osp.join(seq, f'{t + 1:04}.jpg'),
                        img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
            boxes.append([x0 + 1, y0 + 1, 30, 30])
        np.savetxt(osp.join(root, f'Seq{s}', 'groundtruth_rect.txt'),
                   np.array(boxes), fmt='%d', delimiter=',')


def test_track_batch_matches_sequential(tmp_path):
    """track_batch (K sequences per dispatch) must produce the same boxes
    as the sequential got10k-style loop: identical host crops feed the
    grouped xcorr (kernel k pairs with its own crops) and the identical
    _apply_response math."""
    make_otb_multi_fixture(str(tmp_path))
    cfg = dict(default_cfg)
    cfg['model'] = {'backbone': dict(type='ResNet', depth=18,
                                     frozen_stages=4,
                                     dilations=(1, 1, 2, 4),
                                     strides=(1, 2, 1, 1),
                                     out_indices=(3,), norm_eval=True)}
    tracker = TrackerSiamFC(cfg)
    tracker.init_weights()
    exp = ExperimentOTB(str(tmp_path),
                        result_dir=str(tmp_path / 'results'),
                        report_dir=str(tmp_path / 'reports'))
    assert len(exp.seq_names) == 3
    serial = exp.run(tracker)
    batched = exp.run(tracker, batch_size=2)  # 2+1: ragged final chunk
    assert set(serial) == set(batched)
    for name in serial:
        sb, bb = serial[name][0], batched[name][0]
        assert sb.shape == bb.shape
        # same crops, same math; tolerance covers batched-vs-single conv
        # scheduling differences only
        np.testing.assert_allclose(bb, sb, atol=1.0)


def test_eval_metrics_perfect():
    from siamfc_tpu import eval_metrics
    boxes = np.array([[10, 10, 20, 20]] * 5, float)
    succ, prec = eval_metrics(boxes, boxes)
    assert succ[-2] == 1.0  # IoU 1 > 0.95
    assert prec[20] == 1.0


def test_bilinear_sample_matrix_matches_cv2():
    """In-jit crop+resize (traced-scalar sampling matmuls) must equal the
    host path: integer-corner patch + cv2.INTER_LINEAR (float input: cv2
    uses exact float bilinear, so the match is tight)."""
    import cv2
    import jax.numpy as jnp

    from siamfc_tpu.device_crops import bilinear_sample_matrix

    rng = np.random.RandomState(0)
    img = rng.rand(50, 60).astype(np.float32)
    corner_y, corner_x, size, out = 3, 7, 17, 29
    want = cv2.resize(img[corner_y:corner_y + size,
                          corner_x:corner_x + size],
                      (out, out), interpolation=cv2.INTER_LINEAR)
    wy = bilinear_sample_matrix(50, out, jnp.asarray(corner_y),
                                jnp.asarray(size))
    wx = bilinear_sample_matrix(60, out, jnp.asarray(corner_x),
                                jnp.asarray(size))
    got = np.asarray(jnp.einsum('yi,ij,xj->yx', wy, jnp.asarray(img), wx))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_cubic_resize_matrix_matches_cv2():
    """The response upsample constant must reproduce cv2.INTER_CUBIC
    (A=-0.75 Keys kernel) on float inputs."""
    import cv2

    from siamfc_tpu.device_crops import cubic_resize_matrix

    rng = np.random.RandomState(1)
    r = rng.rand(17, 17).astype(np.float32)
    want = cv2.resize(r, (272, 272), interpolation=cv2.INTER_CUBIC)
    u = cubic_resize_matrix(17, 272)
    got = u @ r @ u.T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_device_crops_match_host_path(tmp_path):
    """The on-device update (region upload + in-jit crops/response post)
    must track like the host-crop path: same fixture, boxes within 1px
    (sub-pixel resampling differences only — cv2's fixed-point uint8
    bilinear vs our float path)."""
    make_otb_fixture(str(tmp_path), num_frames=10)
    boxes = {}
    for dev in (True, False):
        cfg = dict(default_cfg)
        cfg['device_crops'] = dev
        cfg['model'] = {'backbone': dict(type='ResNet', depth=18,
                                         frozen_stages=4,
                                         dilations=(1, 1, 2, 4),
                                         strides=(1, 2, 1, 1),
                                         out_indices=(3,),
                                         norm_eval=True)}
        tracker = TrackerSiamFC(cfg)
        tracker.init_weights()
        files = sorted(
            (tmp_path / 'Square' / 'img').glob('*.jpg'))
        gt = np.loadtxt(tmp_path / 'Square' / 'groundtruth_rect.txt',
                        delimiter=',')
        boxes[dev], _ = tracker.track([str(f) for f in files], gt[0])
    np.testing.assert_allclose(boxes[True], boxes[False], atol=1.5)


def test_device_scale_crops_bit_exact_vs_cv2():
    """The in-jit crop resize must replicate cv2's uint8 INTER_LINEAR
    pipeline (reference ops.py:87-124 host path): bit-exact for
    downscale crops; upscale crops dispatch to a different cv2
    SIMD/IPP kernel and are allowed <=0.3% of values off by exactly
    one LSB (measured ~0.1%)."""
    from siamfc_tpu import ops
    from siamfc_tpu.device_crops import (device_scale_crops, make_region,
                                         make_taps)

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (360, 640, 3), np.uint8)
    center = np.array([181.3, 322.8], np.float32)
    avg = img.mean(axis=(0, 1))
    for sizes, upscale in [([258.9, 280.0, 310.2], False),
                           ([96.0, 140.5, 200.9], True)]:
        host = np.stack([
            ops.crop_and_resize(img, center, s, 255, border_value=avg)
            for s in sizes]).astype(np.float32)
        region, offs, sz = make_region(img, center, sizes, avg)
        taps = make_taps(offs, sz, 255)
        dev = np.asarray(device_scale_crops(jnp.asarray(region),
                                            jnp.asarray(taps)))
        d = np.abs(dev - host)
        if upscale:
            assert d.max() <= 1.0 and (d > 0).mean() < 3e-3, \
                f'upscale crops drifted: max {d.max()} frac {(d > 0).mean()}'
        else:
            assert d.max() == 0.0, \
                f'downscale crops not bit-exact: max {d.max()}'
