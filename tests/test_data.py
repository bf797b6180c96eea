"""Data-layer tests: DAVIS index contract, one-shot filtering, transforms."""
import numpy as np
import pytest

from fosvos_tpu.data import davis, synthetic, transforms


@pytest.fixture(scope='module')
def db(tmp_path_factory):
    return synthetic.generate(str(tmp_path_factory.mktemp('davis')))


def test_train_split_index(db):
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    assert len(ds) == 8  # 2 sequences x 4 frames
    s = ds[0]
    assert s['image'].shape == (64, 96, 3)
    assert s['gt'].shape == (64, 96)
    assert s['gt'].max() <= 1.0 and s['gt'].min() >= 0.0
    assert s['seq_name'] == 'synth-bear'
    assert s['fname'] == '00000'


def test_mean_subtraction(db):
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    img, _ = ds.make_img_gt_pair(0)
    # background pixels are in [0,60) BGR minus the mean -> strictly negative
    assert img.min() < -40
    assert img.dtype == np.float32


def test_one_shot_train_single_frame(db):
    ds = davis.DAVIS2016(mode='train', db_root_dir=db, seq_name='synth-swan')
    assert len(ds) == 1  # only first annotated frame (davis_2016.py:79-83)
    assert ds[0]['gt'].max() > 0.5


def test_one_shot_test_gt_first_frame_only(db):
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    assert len(ds) == 4
    assert ds[0]['gt'].max() > 0.5
    for i in range(1, 4):
        assert ds[i]['gt'].max() == 0.0  # labels dropped after frame 0


def test_val_split(db):
    ds = davis.DAVIS2016(mode='test', db_root_dir=db)
    assert ds.sequence_names == ['synth-swan', 'synth-goat']


def test_load_sequence_dense(db):
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-goat')
    imgs, gts, names = ds.load_sequence()
    assert imgs.shape == (4, 64, 96, 3)
    assert gts.shape == (4, 64, 96)
    assert names == [f'{i:05d}' for i in range(4)]


def test_input_res_resize(db):
    ds = davis.DAVIS2016(mode='train', db_root_dir=db, input_res=(32, 48))
    img, gt = ds.make_img_gt_pair(0)
    assert img.shape == (32, 48, 3)
    assert gt.shape == (32, 48)
    assert set(np.unique(gt)).issubset({0.0, 1.0})


def test_random_horizontal_flip_round_trip():
    rng = np.random.RandomState(0)
    img = np.arange(24, dtype=np.float32).reshape(2, 4, 3)
    gt = np.arange(8, dtype=np.float32).reshape(2, 4)
    flipped_any = False
    for _ in range(20):
        s = transforms.random_horizontal_flip(
            {'image': img, 'gt': gt, 'fname': 'x'}, rng)
        if not np.array_equal(s['image'], img):
            flipped_any = True
            np.testing.assert_array_equal(s['image'], img[:, ::-1])
            np.testing.assert_array_equal(s['gt'], gt[:, ::-1])
    assert flipped_any


@pytest.mark.parametrize('scale', [0.5, 0.8, 1.0])
def test_resize_scales(scale):
    img = np.random.RandomState(0).rand(40, 60, 3).astype(np.float32)
    gt = (np.random.RandomState(1).rand(40, 60) > 0.5).astype(np.float32)
    s = transforms.resize({'image': img, 'gt': gt}, scale)
    assert s['image'].shape == (int(40 * scale), int(60 * scale), 3)
    # nearest for masks: values stay binary
    assert set(np.unique(s['gt'])).issubset({0.0, 1.0})


def test_scale_schedule_cover_all_steps():
    rng = np.random.RandomState(0)
    schedule = transforms.scale_schedule(1000, rng)
    assert sum(n for _, n in schedule) == 1000
    assert {s for s, _ in schedule} == set(transforms.TRAIN_SCALES)


def test_scale_schedule_interleaves_scales():
    """Scales must interleave at chunk granularity (no scale curriculum —
    the reference draws the scale uniformly per step), each scale gets an
    equal chunk share, and only one scan length exists per scale (one
    compile per scale)."""
    rng = np.random.RandomState(0)
    n_steps, chunk = 10000, 50
    schedule = transforms.scale_schedule(n_steps, rng, chunk_steps=chunk)
    assert sum(n for _, n in schedule) == n_steps
    assert all(n == chunk for _, n in schedule)
    order = [s for s, _ in schedule]
    # equal shares: 200 chunks over 3 scales
    counts = {s: order.count(s) for s in transforms.TRAIN_SCALES}
    assert max(counts.values()) - min(counts.values()) <= 1
    # interleaved: scales switch many times, not 3 contiguous runs
    switches = sum(a != b for a, b in zip(order, order[1:]))
    assert switches > 50
    # accumulation windows never straddle a shape change (chunk % 5 == 0)
    assert all(n % 5 == 0 for _, n in schedule)


def test_scale_schedule_small_budget_sees_every_scale():
    rng = np.random.RandomState(0)
    schedule = transforms.scale_schedule(6, rng)
    assert sum(n for _, n in schedule) == 6
    assert {s for s, _ in schedule} == set(transforms.TRAIN_SCALES)


def test_scale_schedule_window_alignment():
    """With align=n_acc (batched-window mode), every chunk is a multiple of
    the accumulation window except at most one trailing remainder chunk."""
    for n_steps in (10000, 1003, 24, 7, 5, 3):
        rng = np.random.RandomState(1)
        schedule = transforms.scale_schedule(n_steps, rng, align=5)
        assert sum(n for _, n in schedule) == n_steps
        sizes = [n for _, n in schedule]
        assert all(n % 5 == 0 for n in sizes[:-1])
        # partial windows only at the very end
        if sizes[-1] % 5:
            assert sizes[-1] == n_steps % 5 or n_steps < 5


def test_device_flip():
    import jax.numpy as jnp
    img = jnp.arange(24, dtype=jnp.float32).reshape(1, 2, 4, 3)
    gt = jnp.arange(8, dtype=jnp.float32).reshape(1, 2, 4, 1)
    i2, g2 = transforms.device_flip(img, gt, jnp.asarray(1))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(img)[:, :, ::-1])
    np.testing.assert_array_equal(np.asarray(g2), np.asarray(gt)[:, :, ::-1])
    i3, g3 = transforms.device_flip(img, gt, jnp.asarray(0))
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(img))


def test_scale_n_rotate_preserves_shape():
    rng = np.random.RandomState(0)
    img = np.random.RandomState(2).rand(40, 60, 3).astype(np.float32)
    gt = (np.random.RandomState(3).rand(40, 60) > 0.5).astype(np.float32)
    s = transforms.scale_n_rotate({'image': img, 'gt': gt}, rng)
    assert s['image'].shape == img.shape
    assert s['gt'].shape == gt.shape
