"""Coverage for the auxiliary components that previously had no direct
tests: the 'Me' custom dataset, the dataset-prep CLI, the folder renamer,
the viz/geometry helpers, and the timing utilities."""
import numpy as np
import pytest


# ---------------------------------------------------------------------------
# data/custom_images.py — the personal 'Me' dataset (reference
# src/dataloaders/custom_images.py)
# ---------------------------------------------------------------------------

@pytest.fixture()
def me_tree(tmp_path):
    import cv2
    (tmp_path / 'Images').mkdir()
    (tmp_path / 'Annotations').mkdir()
    rng = np.random.RandomState(0)
    lines = []
    for i in range(3):
        img = rng.randint(0, 255, (24, 32, 3), dtype=np.uint8)
        ann = np.zeros((24, 32), np.uint8)
        ann[6:18, 8:24] = 255
        cv2.imwrite(str(tmp_path / 'Images' / f'{i}.jpg'), img)
        cv2.imwrite(str(tmp_path / 'Annotations' / f'{i}.png'), ann)
        lines.append(f'/Images/{i}.jpg /Annotations/{i}.png')
    (tmp_path / 'train.txt').write_text('\n'.join(lines) + '\n')
    return tmp_path


def test_custom_images_dataset(me_tree):
    from fosvos_tpu.data.custom_images import CUSTOM_MEAN_BGR, CustomImages

    ds = CustomImages(mode='train', db_root_dir=str(me_tree))
    assert len(ds) == 3
    assert ds.meanval == CUSTOM_MEAN_BGR          # the 'Me' mean, not DAVIS
    assert all(s.seq_name == 'Me' for s in ds.samples)

    img, gt = ds.make_img_gt_pair(0)
    assert img.shape == (24, 32, 3) and img.dtype == np.float32
    assert gt.shape == (24, 32)
    assert gt.max() == 1.0 and gt.min() == 0.0    # normalized by max
    # mean-subtracted: values centered far below the uint8 range
    assert img.mean() < 50

    with pytest.raises(ValueError):
        CustomImages(mode='bogus', db_root_dir=str(me_tree))


# ---------------------------------------------------------------------------
# cli/custom_helpers.py — dataset-prep commands (reference
# src/custom_helpers.py; its directory contract feeds CustomImages)
# ---------------------------------------------------------------------------

@pytest.fixture()
def prep_tree(tmp_path):
    import cv2
    rng = np.random.RandomState(0)
    for d in ('background', 'source', 'foreground_annotations'):
        (tmp_path / d).mkdir()
    for i in range(2):
        bg = rng.randint(0, 255, (40, 48, 3), dtype=np.uint8)
        cv2.imwrite(str(tmp_path / 'background' / f'bg{i}.jpg'), bg)
    src = rng.randint(0, 255, (16, 20, 3), dtype=np.uint8)
    cv2.imwrite(str(tmp_path / 'source' / 'p0.jpg'), src)
    ann = np.zeros((16, 20, 3), np.uint8)
    ann[4:12, 5:15] = 255
    cv2.imwrite(str(tmp_path / 'foreground_annotations' / 'p0.png'), ann)
    return tmp_path


def test_custom_helpers_pipeline(prep_tree):
    """mean -> filter -> overlay: the full synthetic-dataset prep flow."""
    import cv2
    from click.testing import CliRunner
    from fosvos_tpu.cli.custom_helpers import cli

    runner = CliRunner()
    r = runner.invoke(cli, ['-d', str(prep_tree), 'mean'], obj={})
    assert r.exit_code == 0, r.output
    assert '[' in r.output                          # 3-channel mean printed

    r = runner.invoke(cli, ['-d', str(prep_tree), 'filter'], obj={})
    assert r.exit_code == 0, r.output
    fg = cv2.imread(str(prep_tree / 'foreground' / 'p0.jpg'))
    assert fg is not None
    assert fg[:4].max() <= 16          # outside annotation (~0 mod JPEG loss)

    r = runner.invoke(cli, ['-d', str(prep_tree), 'overlay', '--seed', '0'],
                      obj={})
    assert r.exit_code == 0, r.output
    # 2 backgrounds x 1 foreground x 3 draws = 6 composites + annotations
    assert len(list((prep_tree / 'images').glob('*.jpg'))) == 6
    assert len(list((prep_tree / 'annotations').glob('*.png'))) == 6


# ---------------------------------------------------------------------------
# cli/rename_folders.py (reference src/playground/rename_folders.py)
# ---------------------------------------------------------------------------

def test_rename_folders(tmp_path):
    from fosvos_tpu.cli.rename_folders import main

    (tmp_path / 'offline_min_2').mkdir()
    (tmp_path / 'offline_min_4').mkdir()
    (tmp_path / 'keepme').mkdir()

    main(['--base-dir', str(tmp_path), '--dry-run'])
    assert (tmp_path / 'offline_min_2').exists()    # dry run: untouched

    main(['--base-dir', str(tmp_path)])
    assert sorted(p.name for p in tmp_path.iterdir()) == ['2', '4', 'keepme']


# ---------------------------------------------------------------------------
# data/helpers.py — viz/geometry helpers (reference
# src/dataloaders/helpers.py)
# ---------------------------------------------------------------------------

def test_helpers_geometry_and_overlay():
    from fosvos_tpu.data import helpers

    # make_gaussian peaks at the requested center, in (x, y) order
    g = helpers.make_gaussian((20, 30), sigma=4, center=(25, 5))
    assert g.shape == (20, 30)
    assert np.unravel_index(np.argmax(g), g.shape) == (5, 25)
    assert g.max() == 1.0

    # point_in_segmentation returns an interior point of the mask
    seg = np.zeros((20, 30), np.uint8)
    seg[5:15, 10:25] = 1
    x, y = helpers.point_in_segmentation(seg)
    assert seg[y, x] == 1

    # overlay_mask blends inside the mask, leaves the outside untouched
    im = np.zeros((20, 30, 3), np.float32)
    ma = seg.astype(bool)
    out = helpers.overlay_mask(im, ma, color=np.array([1.0, 0.0, 0.0]))
    assert out[0, 0, 0] == 0.0                      # outside unchanged
    assert out[10, 12, 0] > 0.0                     # red blended inside

    # im_normalize maps to [0, 1]
    n = helpers.im_normalize(np.array([2.0, 4.0, 6.0]))
    np.testing.assert_allclose(n, [0.0, 0.5, 1.0])

    assert helpers.tens2image(np.zeros((1, 4, 5, 1))).shape == (4, 5)


# ---------------------------------------------------------------------------
# runtime/timing.py
# ---------------------------------------------------------------------------

def test_timing_utilities():
    import jax.numpy as jnp
    from fosvos_tpu.runtime import timing

    t = timing.Timer()
    assert t.elapsed() >= 0.0

    calls = []

    def fn(x):
        calls.append(1)
        return jnp.asarray(x) * 2.0

    times = timing.time_blocked(fn, 3.0, n_runs=4)
    assert times.shape == (4,)
    assert len(calls) == 5                          # skip_first warmup call
    assert (times >= 0).all()

    calls.clear()
    dt = timing.time_pipelined(fn, 3.0, n_runs=6)
    assert dt >= 0.0
    assert len(calls) == 7                          # 1 warm + 6 timed
