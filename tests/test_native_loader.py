"""Native C++ loader: build, decode parity with cv2, prefetch iteration."""
import numpy as np
import pytest

from fosvos_tpu import native
from fosvos_tpu.data import davis, loader, synthetic


@pytest.fixture(scope='module')
def db(tmp_path_factory):
    return synthetic.generate(str(tmp_path_factory.mktemp('davis')),
                              n_frames=4)


def test_native_builds():
    assert native.build(), native.build_error()
    assert native.load_library() is not None


def test_native_decode_matches_cv2(db):
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    got = {}
    with loader.NativePrefetcher(ds, n_threads=2) as pf:
        for idx, img, gt in pf:
            got[idx] = (img, gt)
    assert len(got) == len(ds)
    for i in range(len(ds)):
        img_ref, gt_ref = ds.make_img_gt_pair(i)
        img, gt = got[i]
        # same JPEG decoder family (libjpeg): allow +-1 intensity from
        # rounding differences in IDCT paths
        assert np.abs(img - img_ref).max() <= 1.0
        np.testing.assert_allclose(gt, gt_ref, atol=1 / 255 + 1e-6)
        # mask is exactly binary on the fixture
        assert set(np.unique(gt)).issubset({0.0, 1.0})


def test_iterate_samples_native_and_fallback(db):
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    native_items = sorted(loader.iterate_samples(ds, use_native=True),
                          key=lambda t: t[0])
    py_items = sorted(loader.iterate_samples(ds, use_native=False),
                      key=lambda t: t[0])
    assert [i for i, _, _ in native_items] == [i for i, _, _ in py_items]
    for (_, a, ga), (_, b, gb) in zip(native_items, py_items):
        assert np.abs(a - b).max() <= 1.0
        np.testing.assert_allclose(ga, gb, atol=1 / 255 + 1e-6)


def test_shuffled_order(db):
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    order = list(np.random.RandomState(0).permutation(len(ds)))
    seen = [i for i, _, _ in loader.iterate_samples(ds, order=order)]
    assert sorted(seen) == sorted(order)


def test_native_raw_mode_matches_files(db):
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    got = {}
    with loader.NativePrefetcher(ds, n_threads=2, raw=True) as pf:
        for idx, img, gt in pf:
            got[idx] = (img, gt)
    assert len(got) == len(ds)
    for i in range(len(ds)):
        img_ref, gt_ref = ds.make_raw_pair(i)
        img, gt = got[i]
        assert img.dtype == np.uint8 and gt.dtype == np.uint8
        assert np.abs(img.astype(int) - img_ref.astype(int)).max() <= 1
        np.testing.assert_array_equal(gt, gt_ref)


def test_native_mask_writer_matches_cv2(tmp_path):
    """fl_write_masks: threaded PNG encode must round-trip bit-exact and
    match what cv2 would have written (the eval mask contract)."""
    import cv2
    from fosvos_tpu import native

    rng = np.random.RandomState(0)
    masks = rng.randint(0, 256, (5, 33, 47), dtype=np.uint8)
    paths = [tmp_path / f'{i:05d}.png' for i in range(5)]
    wrote = native.write_masks(paths, masks)
    if wrote is None:
        pytest.skip(f'native build unavailable: {native.build_error()}')
    assert wrote == 5
    for i, p in enumerate(paths):
        back = cv2.imread(str(p), 0)
        np.testing.assert_array_equal(back, masks[i])

    # empty batch is a no-op
    assert native.write_masks([], np.zeros((0, 4, 4), np.uint8)) == 0


def test_write_masks_batch_native_and_fallback(tmp_path, monkeypatch):
    """experiment.write_masks_batch: native path on many-core hosts,
    cv2 fallback otherwise/on failure — identical PNGs either way."""
    import os
    import cv2
    from fosvos_tpu import native
    from fosvos_tpu.evaluation import experiment

    masks = np.random.RandomState(1).randint(0, 256, (3, 16, 24),
                                             dtype=np.uint8)

    # many-core host: the native threaded writer is used
    monkeypatch.setattr(os, 'cpu_count', lambda: 8)
    d_native = tmp_path / 'native'
    d_native.mkdir()
    experiment.write_masks_batch(d_native, ['a', 'b', 'c'], masks)

    # native unavailable: cv2 fallback
    monkeypatch.setattr(native, 'write_masks', lambda *a, **k: None)
    d_cv2 = tmp_path / 'cv2'
    d_cv2.mkdir()
    experiment.write_masks_batch(d_cv2, ['a', 'b', 'c'], masks)

    for i, n in enumerate(['a', 'b', 'c']):
        np.testing.assert_array_equal(
            cv2.imread(str(d_native / f'{n}.png'), 0), masks[i])
        np.testing.assert_array_equal(
            cv2.imread(str(d_cv2 / f'{n}.png'), 0), masks[i])
