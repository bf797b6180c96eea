"""Tests for the J&F evaluator and the inference/eval driver."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fosvos_tpu.data import davis, synthetic
from fosvos_tpu.evaluation import experiment, metrics
from fosvos_tpu.models import OSVOSResNet, resnet_arch


def test_iou_basic():
    a = np.zeros((10, 10), bool)
    b = np.zeros((10, 10), bool)
    a[2:6, 2:6] = True
    assert metrics.iou(a, a) == 1.0
    assert metrics.iou(a, b) == 0.0
    assert metrics.iou(b, b) == 1.0  # both-empty convention
    b[2:6, 2:4] = True
    assert metrics.iou(a, b) == pytest.approx(0.5)


def test_f_boundary_perfect_and_shifted():
    a = np.zeros((100, 100), bool)
    a[30:70, 30:70] = True
    assert metrics.f_boundary(a, a) == 1.0
    # 1px shift stays within the tolerance radius at this resolution
    b = np.roll(a, 1, axis=0)
    assert metrics.f_boundary(a, b) == 1.0
    # large shift -> poor F
    c = np.roll(a, 25, axis=0)
    assert metrics.f_boundary(a, c) < 0.5
    # empty prediction vs non-empty gt
    assert metrics.f_boundary(a, np.zeros_like(a)) == 0.0


def test_seg2bmap_toolkit_convention():
    """seg2bmap marks BOTH sides of a transition (davis-2017 toolkit /
    BSDS convention), hand-checked on a 1px-interior square."""
    seg = np.zeros((8, 8), bool)
    seg[2:5, 2:5] = True   # 3x3 block, rows/cols 2..4
    b = metrics.seg2bmap(seg)
    # each transition pair marks its west/north pixel: bg above/left of the
    # block, fg along the block's right/bottom edges
    assert b[1, 2] and b[2, 1]          # bg side (north, west)
    assert b[2, 4] and b[4, 2]          # fg side (east, south edges)
    # interior center and the block's top-left fg pixel are not boundary
    # (all their east/south/se neighbours are fg)
    assert not b[3, 3] and not b[2, 2]
    # empty and full-frame masks have no boundary: the toolkit's edge
    # handling uses the in-bounds east diff on the last row and the
    # in-bounds SOUTH diff on the last column (not the zero-padded shifts)
    assert not metrics.seg2bmap(np.zeros((6, 6), bool)).any()
    assert not metrics.seg2bmap(np.ones((6, 6), bool)).any()
    # mask touching the image corner: edge pixels are boundary only where
    # an in-bounds transition exists; the corner is never boundary
    edge = np.zeros((6, 6), bool)
    edge[4:, 4:] = True
    be = metrics.seg2bmap(edge)
    assert not be[5, 5]          # corner forced off
    assert be[5, 3] and be[3, 4]  # bg pixels adjacent to the block
    # last column: bg pixel above the block marked via its south diff
    assert be[3, 5] and not be[4, 5]


def test_f_boundary_bound_on_known_offsets():
    """Measured bound for the dilation matching: F degrades monotonically
    with offset and hits 0 beyond 2x the tolerance radius."""
    a = np.zeros((100, 100), bool)
    a[30:70, 30:70] = True
    tol = int(np.ceil(0.008 * np.linalg.norm(a.shape)))  # = 2 px here
    f_within = metrics.f_boundary(a, np.roll(a, tol, axis=0))
    f_beyond = metrics.f_boundary(a, np.roll(a, 4 * tol, axis=0))
    assert f_within > 0.9 > f_beyond
    # shifting fully out of match range: only the two parallel edges
    # orthogonal to the shift can still match
    f_far = metrics.f_boundary(a, np.roll(a, 20, axis=0))
    assert f_far < f_beyond or f_beyond < 0.6


def test_db_statistics_decay():
    v = np.linspace(1.0, 0.0, 20)  # degrading quality
    st = metrics.db_statistics(v)
    assert st.mean == pytest.approx(0.5)
    assert st.decay > 0.5
    st2 = metrics.db_statistics(np.ones(20))
    assert st2.decay == pytest.approx(0.0)
    assert st2.recall == 1.0


def test_db_statistics_matches_toolkit_on_six_frames():
    """Hand-computed 6-frame example against the fperazzi/davis-2017
    toolkit's ``db_statistics`` formula. The toolkit receives the FULL
    per-frame array and trims first/last in-function (recall =
    ``nanmean(v[1:-1] > 0.5)``, decay bins over ``v[1:-1]``); our
    ``evaluate_sequence`` trims before computing per-frame values and
    ``db_statistics`` must NOT re-trim — the exclusion applies exactly once
    (a re-trim here was an off-by-two on recall for short sequences)."""
    full = np.array([1.0, 0.9, 0.2, 0.3, 0.8, 0.0])  # frames 0..5
    core = full[1:-1]                                 # protocol-evaluated

    # toolkit formula, computed by hand on `full`:
    #   recall = mean([0.9, 0.2, 0.3, 0.8] > 0.5) = 0.5
    #   decay:  ids = round(linspace(1,4,5)+1e-10)-1 = [0,1,2,2,3]
    #           bins = [[.9,.2], [.2,.3], [.3], [.3,.8]]
    #           D = mean([.9,.2]) - mean([.3,.8]) = 0.55 - 0.55 = 0.0
    st = metrics.db_statistics(core)
    assert st.mean == pytest.approx(np.mean(core))
    assert st.recall == pytest.approx(0.5)
    assert st.decay == pytest.approx(0.0)

    # the buggy double-trim would have given recall = mean([0.2,0.3]>0.5)=0
    assert st.recall != pytest.approx(np.mean(core[1:-1] > 0.5))

    # and via the public entry point: per-frame J engineered to `full`
    # (frame i: intersection k of 10 GT rows -> J = k/10)
    ann = [np.zeros((20, 20), bool) for _ in range(6)]
    seg = [np.zeros((20, 20), bool) for _ in range(6)]
    for i, j_val in enumerate(full):
        ann[i][5:15, 5:15] = True
        seg[i][5:5 + int(round(j_val * 10)), 5:15] = True
    ev = metrics.evaluate_sequence(ann, seg)
    assert ev.j.per_frame == pytest.approx(core)
    assert ev.j.recall == pytest.approx(0.5)
    assert ev.j.decay == pytest.approx(0.0)
    assert ev.j.mean == pytest.approx(np.mean(core))  # J mean unchanged


class TestToolkitStatSemantics:
    """Settle mean/recall/decay trim semantics against the two public
    evaluator generations by EXECUTING their ``db_statistics`` code.

    Both functions below are quoted from the public repos (reconstructed
    from their published source — this environment has no network egress,
    so layout/whitespace may differ but the executable semantics are the
    published ones):

    ``_fperazzi_db_statistics`` — fperazzi/davis (DAVIS-2016 benchmark
    toolkit) and its davis-2017 fork, the scorer the reference ran
    (``/root/reference/src/eval/README.md:2-3``)::

        def db_statistics(per_frame_values):
            # strip off nan values
            M = np.nanmean(per_frame_values)
            O = np.nanmean(per_frame_values[1:-1]>0.5)
            # Compute decay as implemented in Matlab
            per_frame_values = per_frame_values[1:-1] # Remove first frame
            N_bins = 4 # Sum of 4 (bins) should be 100%
            ids = np.round(np.linspace(1,len(per_frame_values),N_bins+1)+1e-10)-1
            ids = ids.astype(np.uint8)
            D_bins = [per_frame_values[ids[i]:ids[i+1]+1] for i in range(0,4)]
            D = np.nanmean(D_bins[0])-np.nanmean(D_bins[3])
            return M,O,D

    — its caller passes the FULL per-frame array: the in-function ``[1:-1]``
    covers recall and decay but the MEAN spans all frames.

    ``_official_db_statistics`` — davis2017-evaluation
    (``davis2017/utils.py``), the current official scorer::

        def db_statistics(per_frame_values):
            M = np.nanmean(per_frame_values)
            O = np.nanmean(per_frame_values > 0.5)
            N_bins = 4
            ids = np.round(np.linspace(1, len(per_frame_values), N_bins + 1) + 1e-10) - 1
            ids = ids.astype(np.uint8)
            D_bins = [per_frame_values[ids[i]:ids[i + 1] + 1] for i in range(0, 4)]
            D = np.nanmean(D_bins[0]) - np.nanmean(D_bins[3])
            return M, O, D

    — NO in-function trim; its caller (``davis2017/evaluation.py``,
    semi-supervised task) pre-trims masks with ``all_gt_masks[:, 1:-1]``.
    """

    @staticmethod
    def _fperazzi_db_statistics(per_frame_values):
        per_frame_values = np.asarray(per_frame_values, np.float64)
        M = np.nanmean(per_frame_values)
        O = np.nanmean(per_frame_values[1:-1] > 0.5)
        per_frame_values = per_frame_values[1:-1]
        N_bins = 4
        ids = np.round(np.linspace(1, len(per_frame_values), N_bins + 1)
                       + 1e-10) - 1
        ids = ids.astype(np.uint8)
        D_bins = [per_frame_values[ids[i]:ids[i + 1] + 1] for i in range(4)]
        D = np.nanmean(D_bins[0]) - np.nanmean(D_bins[3])
        return M, O, D

    @staticmethod
    def _official_db_statistics(per_frame_values):
        per_frame_values = np.asarray(per_frame_values, np.float64)
        M = np.nanmean(per_frame_values)
        O = np.nanmean(per_frame_values > 0.5)
        N_bins = 4
        ids = np.round(np.linspace(1, len(per_frame_values), N_bins + 1)
                       + 1e-10) - 1
        ids = ids.astype(np.uint8)
        D_bins = [per_frame_values[ids[i]:ids[i + 1] + 1] for i in range(4)]
        D = np.nanmean(D_bins[0]) - np.nanmean(D_bins[3])
        return M, O, D

    def test_ours_equals_official_scorer_on_pretrimmed(self):
        """Default semantics == davis2017-evaluation: caller trims, stats
        over the trimmed array — exact match on random inputs."""
        rng = np.random.RandomState(0)
        for n in (3, 4, 6, 25, 80, 104):
            full = rng.rand(n)
            st = metrics.db_statistics(full[1:-1])
            M, O, D = self._official_db_statistics(full[1:-1])
            assert st.mean == pytest.approx(M)
            assert st.recall == pytest.approx(O)
            assert st.decay == pytest.approx(D)

    def test_recall_decay_identical_across_toolkit_generations(self):
        """fperazzi on the FULL array == ours on the caller-trimmed array
        for recall and decay (each trims exactly once)."""
        rng = np.random.RandomState(1)
        for n in (4, 6, 25, 80, 104):
            full = rng.rand(n)
            st = metrics.db_statistics(full[1:-1])
            _, O, D = self._fperazzi_db_statistics(full)
            assert st.recall == pytest.approx(O)
            assert st.decay == pytest.approx(D)

    def test_fperazzi_mean_spans_full_array_and_compat_mode_matches(self):
        """The generations DIFFER on the mean (fperazzi includes the
        first/last frames); ``evaluate_sequence(toolkit='davis2016')``
        reproduces the fperazzi mean for YAML comparability."""
        # per-frame J engineered as in the six-frame test above
        full = np.array([1.0, 0.9, 0.2, 0.3, 0.8, 0.0])
        Mf, _, _ = self._fperazzi_db_statistics(full)
        assert Mf == pytest.approx(np.mean(full))          # full span
        assert Mf != pytest.approx(np.mean(full[1:-1]))    # the delta is real

        ann = [np.zeros((20, 20), bool) for _ in range(6)]
        seg = [np.zeros((20, 20), bool) for _ in range(6)]
        for i, j_val in enumerate(full):
            ann[i][5:15, 5:15] = True
            seg[i][5:5 + int(round(j_val * 10)), 5:15] = True
        ev16 = metrics.evaluate_sequence(ann, seg, toolkit='davis2016')
        ev17 = metrics.evaluate_sequence(ann, seg)
        assert ev16.j.mean == pytest.approx(Mf)
        assert ev17.j.mean == pytest.approx(np.mean(full[1:-1]))
        # recall/decay unaffected by the toolkit switch
        assert ev16.j.recall == pytest.approx(ev17.j.recall)
        assert ev16.j.decay == pytest.approx(ev17.j.decay)
        with pytest.raises(ValueError):
            metrics.evaluate_sequence(ann, seg, toolkit='davis2018')


def test_evaluate_sequence_and_dataset():
    ann = [np.zeros((20, 20), bool) for _ in range(5)]
    seg = [np.zeros((20, 20), bool) for _ in range(5)]
    for i in range(5):
        ann[i][5:15, 5:15] = True
        seg[i][5:15, 5:15] = True
    ev = metrics.evaluate_sequence(ann, seg)
    assert ev.j.mean == 1.0 and ev.f.mean == 1.0
    ds = metrics.DatasetEval(per_sequence={'a': ev, 'b': ev})
    s = ds.summary()
    assert s['J_mean'] == 1.0 and s['F_recall'] == 1.0


@pytest.fixture(scope='module')
def db(tmp_path_factory):
    return synthetic.generate(str(tmp_path_factory.mktemp('davis')), size=(32, 48))


def test_experiment_test_writes_masks(db, tmp_path):
    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    out = experiment.test(model, variables, ds, str(tmp_path / 'results'),
                          seq_name='synth-swan', batch_size=2)
    masks = out['synth-swan']
    assert masks.shape == (4, 32, 48) and masks.dtype == np.uint8
    import cv2
    png = cv2.imread(str(tmp_path / 'results' / 'synth-swan' / '00002.png'), 0)
    assert png is not None and png.shape == (32, 48)
    np.testing.assert_array_equal(png, masks[2])


def test_inference_engine_int8(db):
    """int8 engine: self-calibrating + explicit-calibration paths produce
    identical masks, close to the float engine's probability maps."""
    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), x, train=False)
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    images, _, _ = ds.load_sequence('synth-swan', raw=True)
    assert images.dtype == np.uint8

    eng_f = experiment.InferenceEngine(model, batch_size=2, mean=ds.meanval)
    eng_q = experiment.InferenceEngine(model, batch_size=2, mean=ds.meanval,
                                       int8=True)
    mf = eng_f.masks_for_sequence(variables, images)
    mq = eng_q.masks_for_sequence(variables, images)  # self-calibrates
    assert mq.shape == mf.shape and mq.dtype == np.uint8
    # uint8 probability maps agree within int8 quantization error
    assert np.mean(np.abs(mq.astype(int) - mf.astype(int))) < 8.0

    eng_q2 = experiment.InferenceEngine(model, batch_size=2, mean=ds.meanval,
                                        int8=True)
    eng_q2.calibrate(variables, images)  # same first-batch calibration data
    np.testing.assert_array_equal(
        mq, eng_q2.masks_for_sequence(variables, images))

    with pytest.raises(ValueError):
        eng_f.calibrate(variables, images)


def test_inference_engine_int8_recalibrates_on_new_weights(db):
    """A shared int8 engine must re-quantize when handed different weights
    (the online sweep serves a different adapted model per sequence)."""
    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    v1 = model.init(jax.random.PRNGKey(3), x, train=False)
    v2 = model.init(jax.random.PRNGKey(4), x, train=False)
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    images, _, _ = ds.load_sequence('synth-swan', raw=True)

    shared = experiment.InferenceEngine(model, batch_size=2,
                                        mean=ds.meanval, int8=True)
    m1 = shared.masks_for_sequence(v1, images)
    m2 = shared.masks_for_sequence(v2, images)

    fresh = experiment.InferenceEngine(model, batch_size=2,
                                       mean=ds.meanval, int8=True)
    np.testing.assert_array_equal(m2, fresh.masks_for_sequence(v2, images))
    assert not np.array_equal(m1, m2)  # genuinely different models served


def test_experiment_benchmark(db):
    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    out = experiment.test(model, variables, ds, '/tmp/unused',
                          seq_name='synth-swan', eval_speeds=True,
                          batch_size=2)
    rep = out['synth-swan']
    assert rep.fps > 0 and rep.mean_s_per_frame > 0


def test_masks_batch_padding(db):
    """T not divisible by batch size must still emit exactly T masks."""
    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    engine = experiment.InferenceEngine(model, batch_size=3)
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-goat')
    images, _, _ = ds.load_sequence()
    masks = engine.masks_for_sequence(variables, images)
    assert masks.shape[0] == 4


def test_uint8_ingest_bit_identical_masks(db):
    """uint8 raw ingest with on-device mean-subtract must produce the same
    mask bytes as host-preprocessed float32 ingest (uint8->f32 is exact)."""
    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    engine = experiment.InferenceEngine(model, batch_size=2)
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    imgs_f, _, _ = ds.load_sequence(raw=False)
    imgs_u, _, _ = ds.load_sequence(raw=True)
    assert imgs_u.dtype == np.uint8 and imgs_f.dtype == np.float32
    m_f = engine.masks_for_sequence(variables, imgs_f)
    m_u = engine.masks_for_sequence(variables, imgs_u)
    np.testing.assert_array_equal(m_u, m_f)


def test_experiment_test_uses_raw_ingest(db, tmp_path):
    """experiment.test end-to-end with the default (uint8) ingest."""
    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-goat')
    out = experiment.test(model, variables, ds, str(tmp_path / 'r'),
                          seq_name='synth-goat', batch_size=2)
    assert len(list((tmp_path / 'r' / 'synth-goat').glob('*.png'))) == 4


def test_visualize_results_writes_overlays(db, tmp_path):
    """is_visualizing_results emits overlay PNGs next to the masks
    (reference experiment_helper.py:83-104, headless)."""
    import cv2
    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    experiment.test(model, variables, ds, str(tmp_path / 'r'),
                    seq_name='synth-swan', batch_size=2,
                    is_visualizing_results=True)
    overlays = sorted((tmp_path / 'r/synth-swan/overlays').glob('*.png'))
    assert len(overlays) == 4
    im = cv2.imread(str(overlays[0]))
    assert im is not None and im.shape == (32, 48, 3)


def test_bf16_engine_masks_close_to_fp32(db):
    """bf16 serving precision: masks agree with fp32 within quantization
    tolerance (thresholded masks are insensitive; exact parity is the fp32
    default's job)."""
    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    imgs, _, _ = ds.load_sequence(raw=True)
    m32 = experiment.InferenceEngine(model, 2).masks_for_sequence(
        variables, imgs)
    m16 = experiment.InferenceEngine(model, 2, bf16=True).masks_for_sequence(
        variables, imgs)
    # uint8 probability maps: allow small quantization differences
    assert np.mean(np.abs(m16.astype(int) - m32.astype(int))) < 8
    # thresholded masks nearly identical
    agree = np.mean((m16 >= 128) == (m32 >= 128))
    assert agree > 0.99


def test_fleet_server_matches_per_stream_engines(db):
    """FleetServer: one vmapped dispatch over S (params, frame) pairs must
    reproduce each stream's own single-model forward exactly (fp32)."""
    from fosvos_tpu.evaluation import fleet

    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    var_list = [model.init(jax.random.PRNGKey(k), x, train=False)
                for k in range(3)]
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    imgs, _, _ = ds.load_sequence(raw=True)       # (4, H, W, 3) uint8
    frames = imgs[:3]                              # one frame per stream

    server = fleet.FleetServer(model)
    stacked = server.put_weights(var_list)
    got = server.segment(stacked, frames)
    assert got.shape == (3, 32, 48) and got.dtype == np.uint8

    engine = experiment.InferenceEngine(model, 1)
    for k in range(3):
        want = engine.masks_for_sequence(var_list[k], frames[k:k + 1])
        np.testing.assert_array_equal(got[k], want[0])


def test_fleet_server_bf16_close(db):
    from fosvos_tpu.evaluation import fleet

    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    var_list = [model.init(jax.random.PRNGKey(k), x, train=False)
                for k in range(2)]
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    imgs, _, _ = ds.load_sequence(raw=True)
    frames = imgs[:2]

    s32 = fleet.FleetServer(model)
    s16 = fleet.FleetServer(model, bf16=True)
    m32 = s32.segment(s32.put_weights(var_list), frames)
    m16 = s16.segment(s16.put_weights(var_list), frames)
    assert np.mean(np.abs(m16.astype(int) - m32.astype(int))) < 8
    assert np.mean((m16 >= 128) == (m32 >= 128)) > 0.99


def test_fleet_server_int8_matches_int8_engine(db):
    """int8 fleet serving: per-stream self-calibration must reproduce the
    int8 InferenceEngine calibrated on the same frame, per stream, exactly
    — and stay close to the float fleet."""
    from fosvos_tpu.evaluation import fleet

    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    var_list = [model.init(jax.random.PRNGKey(k), x, train=False)
                for k in range(2)]
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    imgs, _, _ = ds.load_sequence(raw=True)
    frames = imgs[:2]

    s8 = fleet.FleetServer(model, int8=True)
    stacked = s8.put_weights(var_list)
    m8 = s8.segment(stacked, frames)     # first call self-calibrates

    for k in range(2):
        engine = experiment.InferenceEngine(model, 1, int8=True)
        engine.calibrate(var_list[k], frames[k:k + 1])
        want = engine.masks_for_sequence(var_list[k], frames[k:k + 1])
        np.testing.assert_array_equal(m8[k], want[0])

    s32 = fleet.FleetServer(model)
    m32 = s32.segment(s32.put_weights(var_list), frames)
    assert np.mean((m8 >= 128) == (m32 >= 128)) > 0.95


def test_elastic_fleet_membership_parity_bounded_programs(db):
    """ElasticFleet: joins/leaves reuse the bucketed FleetServer programs
    (never one compile per membership state) and every active stream's mask
    equals its own single-model forward exactly."""
    from fosvos_tpu.evaluation import elastic

    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    var_list = [model.init(jax.random.PRNGKey(k), x, train=False)
                for k in range(5)]
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    imgs, _, _ = ds.load_sequence(raw=True)        # 4 frames, uint8

    engine = experiment.InferenceEngine(model, 1)

    def want(k_vars, frame):
        return engine.masks_for_sequence(var_list[k_vars], frame[None])[0]

    ef = elastic.ElasticFleet(model, capacity=4)
    assert ef.add(var_list[0]) == 0
    m = ef.segment(imgs[:1])
    np.testing.assert_array_equal(m[0], want(0, imgs[0]))

    assert ef.add(var_list[1]) == 1 and ef.add(var_list[2]) == 2
    assert ef.active_slots == (0, 1, 2)
    m = ef.segment(imgs[:3])                        # bucket 4: one pad slot
    for i in range(3):
        np.testing.assert_array_equal(m[i], want(i, imgs[i]))
    assert m.shape[0] == 3                          # padding dropped

    ef.remove(1)
    assert ef.active_slots == (0, 2)
    m = ef.segment(np.stack([imgs[0], imgs[2]]))
    np.testing.assert_array_equal(m[1], want(2, imgs[2]))

    # a new stream recycles the freed slot; serving order is join order
    assert ef.add(var_list[3]) == 1
    assert ef.active_slots == (0, 2, 1)
    m = ef.segment(np.stack([imgs[0], imgs[2], imgs[3]]))
    np.testing.assert_array_equal(m[2], want(3, imgs[3]))

    # in-place weight swap for a re-adapted stream
    ef.swap_weights(2, var_list[4])
    m = ef.segment(np.stack([imgs[0], imgs[2], imgs[3]]))
    np.testing.assert_array_equal(m[1], want(4, imgs[2]))

    ef.add(var_list[4])
    with pytest.raises(ValueError):
        ef.add(var_list[4])                         # at capacity
    with pytest.raises(ValueError):
        ef.segment(imgs[:1])                        # 1 frame, 4 active
    with pytest.raises(ValueError):
        ef.swap_weights(7, var_list[0])             # not an active slot

    # the whole churn above compiled at most one program per bucket {1,2,4}
    assert ef._server._forward_fleet._cache_size() <= 3


def test_service_mask_warning_only_for_id_maps(caplog):
    """join()'s mask normalization warns for object-ID-looking masks
    (integer, >2 distinct values) but stays silent for the documented
    soft/antialiased float [0,1] masks (ADVICE r3)."""
    import logging
    from fosvos_tpu.evaluation.service import VOSService

    ids = np.zeros((8, 8), np.uint8)
    ids[:2] = 1
    ids[2:4] = 2
    soft = np.linspace(0.0, 1.0, 64, dtype=np.float32).reshape(8, 8)
    binary = (ids > 0).astype(np.uint8) * 255

    with caplog.at_level(logging.WARNING):
        out = VOSService._normalize_mask(ids)
        assert any('object-ID' in r.message for r in caplog.records)
    assert out.max() == 1.0

    caplog.clear()
    with caplog.at_level(logging.WARNING):
        out_soft = VOSService._normalize_mask(soft)
        out_bin = VOSService._normalize_mask(binary)
        assert not caplog.records
    assert out_soft.max() == 1.0 and set(np.unique(out_bin)) == {0.0, 1.0}


def test_elastic_serve_cache_off_parity(db):
    """serve_cache=False (memory-tight mode, ADVICE r3): bit-identical
    masks, and no gathered bucket tree retained between frames — the HBM
    cost documented on the class is actually released."""
    from fosvos_tpu.evaluation import elastic

    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    var_list = [model.init(jax.random.PRNGKey(k), x, train=False)
                for k in range(2)]
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    imgs, _, _ = ds.load_sequence(raw=True)

    cached = elastic.ElasticFleet(model, capacity=4)
    uncached = elastic.ElasticFleet(model, capacity=4, serve_cache=False)
    for ef in (cached, uncached):
        ef.add(var_list[0])
        ef.add(var_list[1])
    np.testing.assert_array_equal(cached.segment(imgs[:2]),
                                  uncached.segment(imgs[:2]))
    assert cached._cache_gathered is not None
    assert uncached._cache_gathered is None
    assert uncached._cache_idx is None
    # steady state (same membership, second frame) still matches
    np.testing.assert_array_equal(cached.segment(imgs[2:4]),
                                  uncached.segment(imgs[2:4]))


def test_elastic_segment_async_parity_and_churn(db):
    """segment_async returns an unfetched device array bit-equal to the
    synchronous path, and membership churn issued while the dispatch is in
    flight does not corrupt it (the gather snapshotted the active slots) —
    the invariant cli/serve.py's double-buffered loop relies on."""
    from fosvos_tpu.evaluation import elastic

    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    var_list = [model.init(jax.random.PRNGKey(k), x, train=False)
                for k in range(3)]
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    imgs, _, _ = ds.load_sequence(raw=True)

    ef = elastic.ElasticFleet(model, capacity=4)
    assert ef.add(var_list[0]) == 0 and ef.add(var_list[1]) == 1
    want = ef.segment(imgs[:2])
    fut = ef.segment_async(imgs[:2])
    assert not isinstance(fut, np.ndarray)      # device array, not fetched
    ef.remove(1)                                # churn while in flight
    ef.add(var_list[2])
    np.testing.assert_array_equal(np.asarray(fut), want)


def test_elastic_fleet_int8_parity(db):
    """int8 ElasticFleet: each joining stream calibrates against its own
    weights/frame and serves exactly like its own int8 InferenceEngine;
    swap_weights re-calibrates."""
    from fosvos_tpu.evaluation import elastic

    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    var_list = [model.init(jax.random.PRNGKey(k), x, train=False)
                for k in range(3)]
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    imgs, _, _ = ds.load_sequence(raw=True)

    ef = elastic.ElasticFleet(model, capacity=2, int8=True)
    with pytest.raises(ValueError):
        ef.add(var_list[0])                         # calib_frame required
    ef.add(var_list[0], calib_frame=imgs[0])
    ef.add(var_list[1], calib_frame=imgs[1])
    m = ef.segment(imgs[:2])

    for k in range(2):
        engine = experiment.InferenceEngine(model, 1, int8=True)
        engine.calibrate(var_list[k], imgs[k:k + 1])
        want = engine.masks_for_sequence(var_list[k], imgs[k:k + 1])
        np.testing.assert_array_equal(m[k], want[0])

    ef.swap_weights(0, var_list[2], calib_frame=imgs[0])
    m = ef.segment(imgs[:2])
    engine = experiment.InferenceEngine(model, 1, int8=True)
    engine.calibrate(var_list[2], imgs[0:1])
    want = engine.masks_for_sequence(var_list[2], imgs[0:1])
    np.testing.assert_array_equal(m[0], want[0])


def test_vos_service_join_adapt_serve(db):
    """VOSService: join runs the one-shot adaptation from the parent and
    serves the stream; the served mask equals a manual finetune (same
    seed/budget) -> InferenceEngine chain exactly. leave/readapt churn."""
    from fosvos_tpu.evaluation import service
    from fosvos_tpu.train import online, optimizers

    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    parent = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 48, 3), jnp.float32), train=False)
    tr = davis.DAVIS2016(mode='train', db_root_dir=db, seq_name='synth-swan')
    img0, gt0 = tr.make_img_gt_pair(0)           # mean-subtracted + [0,1]
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    frames, _, _ = ds.load_sequence(raw=True)    # uint8 BGR

    svc = service.VOSService(model, parent, capacity=2, n_epochs=4,
                             avg_grad_every_n=2, mean=ds.meanval)
    slot, res = svc.join(frames[0], (gt0 * 255).astype(np.uint8), seed=0)
    assert res.n_steps == 4 and np.isfinite(res.losses).all()
    got = svc.segment(frames[:1])

    # manual chain with identical inputs/seed must match bit-for-bit
    tuner = online.OnlineFinetuner(model, optimizers.online_variant(11),
                                   avg_grad_every_n=2)
    r2 = tuner.finetune(parent, img0, gt0, n_epochs=4, seed=0)
    engine = experiment.InferenceEngine(model, 1, mean=ds.meanval)
    want = engine.masks_for_sequence(
        {'params': r2.state.params, 'batch_stats': r2.state.batch_stats},
        frames[:1])
    np.testing.assert_array_equal(got[0], want[0])

    # a second stream joins with a different budget; first one leaves
    slot2, _ = svc.join(frames[1], (gt0 * 255).astype(np.uint8),
                        n_epochs=2, seed=1)
    assert svc.active_slots == (slot, slot2)
    svc.leave(slot)
    out = svc.segment(frames[1:2])
    assert out.shape == (1, 32, 48)
    # readapt hot-swaps in place (smoke: serving still works, slot kept)
    svc.readapt(slot2, frames[1], gt0, n_epochs=2, seed=2)
    assert svc.active_slots == (slot2,)
    assert svc.segment(frames[1:2]).shape == (1, 32, 48)


def test_vos_service_vgg_no_batch_stats(db):
    """VOSService on OSVOS-VGG: the no-BN path (empty batch_stats
    collection) must adapt and serve cleanly."""
    from fosvos_tpu.evaluation import service
    from fosvos_tpu.models import OSVOSVGG

    model = OSVOSVGG()
    parent = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 48, 3), jnp.float32), train=False)
    tr = davis.DAVIS2016(mode='train', db_root_dir=db, seq_name='synth-swan')
    _, gt0 = tr.make_img_gt_pair(0)
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    frames, _, _ = ds.load_sequence(raw=True)

    svc = service.VOSService(model, parent, capacity=1, n_epochs=2,
                             avg_grad_every_n=2, mean=ds.meanval)
    _, res = svc.join(frames[0], gt0, seed=0)
    assert res.n_steps == 2 and np.isfinite(res.losses).all()
    out = svc.segment(frames[:1])
    assert out.shape == (1, 32, 48) and out.dtype == np.uint8


def test_vos_service_export_and_adopt(db, tmp_path):
    """export_slot persists what the service is serving (reference
    checkpoint naming + arch JSON); adopt() serves an already-adapted
    checkpoint without re-running adaptation — both bit-equal to the
    live slot's masks."""
    from fosvos_tpu.evaluation import service
    from fosvos_tpu.runtime import checkpoint

    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    parent = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 48, 3), jnp.float32), train=False)
    tr = davis.DAVIS2016(mode='train', db_root_dir=db, seq_name='synth-swan')
    _, gt0 = tr.make_img_gt_pair(0)
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    frames, _, _ = ds.load_sequence(raw=True)

    svc = service.VOSService(model, parent, capacity=2, n_epochs=4,
                             avg_grad_every_n=2, mean=ds.meanval)
    slot, _ = svc.join(frames[0], (gt0 * 255).astype(np.uint8), seed=0)
    live = svc.segment(frames[:1])

    stem = svc.export_slot(slot, tmp_path, 'resnet18',
                           sequence='synth-swan')
    assert stem == 'resnet18_11_11_synth-swan_epoch-3'
    assert checkpoint.exists(str(tmp_path), stem)
    loaded, arch_json = checkpoint.load(str(tmp_path), stem)
    assert arch_json  # topology travels with the weights
    engine = experiment.InferenceEngine(model, 1, mean=ds.meanval)
    want = engine.masks_for_sequence(
        jax.tree.map(jnp.asarray, loaded), frames[:1])
    np.testing.assert_array_equal(live[0], want[0])

    # a second service adopts the exported checkpoint: no adaptation run,
    # identical serving
    svc2 = service.VOSService(model, parent, capacity=1, n_epochs=4,
                              avg_grad_every_n=2, mean=ds.meanval)
    svc2.adopt(jax.tree.map(jnp.asarray, loaded))
    np.testing.assert_array_equal(svc2.segment(frames[:1])[0], live[0])


def test_vos_service_join_many_fanout(db):
    """join_many on a multi-device 'seq' mesh: the cohort adapts in one
    fan-out (FanoutResult), every stream starts serving, and each slot's
    weights actually learned its own target (losses drop, masks differ
    from the parent's)."""
    from fosvos_tpu.evaluation import service
    from fosvos_tpu.parallel import fanout, make_mesh

    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    parent = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 48, 3), jnp.float32), train=False)
    fr, gt = {}, {}
    for seq in ('synth-swan', 'synth-goat'):
        ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name=seq)
        fr[seq], _, _ = ds.load_sequence(raw=True)
        tr = davis.DAVIS2016(mode='train', db_root_dir=db, seq_name=seq)
        _, gt[seq] = tr.make_img_gt_pair(0)
        mean = tr.meanval

    svc = service.VOSService(model, parent, capacity=4, n_epochs=4,
                             avg_grad_every_n=2, mean=mean,
                             fanout_mesh=make_mesh(('seq',)))
    frames0 = np.stack([fr['synth-swan'][0], fr['synth-goat'][0],
                        fr['synth-swan'][1]])
    masks0 = np.stack([(gt['synth-swan'] * 255).astype(np.uint8),
                       (gt['synth-goat'] * 255).astype(np.uint8),
                       (gt['synth-swan'] * 255).astype(np.uint8)])
    slots, res = svc.join_many(frames0, masks0, seed=0)
    assert isinstance(res, fanout.FanoutResult)
    assert len(slots) == 3 and svc.active_slots == tuple(slots)
    assert np.isfinite(res.losses).all()
    # each stream's slot holds weights that moved off the parent
    p0 = np.asarray(jax.tree.leaves(parent['params'])[0])
    for s in slots:
        leaf = np.asarray(jax.tree.leaves(
            svc._fleet.get_weights(s)['params'])[0])
        assert not np.array_equal(leaf, p0)

    out = svc.segment(frames0)
    assert out.shape == (3, 32, 48) and out.dtype == np.uint8

    # cohort + single joins compose: the fleet keeps serving after churn
    svc.leave(slots[1])
    s4, r4 = svc.join(fr['synth-goat'][1], masks0[1], seed=7)
    assert np.isfinite(r4.losses).all()
    assert svc.segment(np.stack(
        [frames0[0], frames0[2], fr['synth-goat'][1]])).shape == (3, 32, 48)


def test_vos_service_join_many_sequential_fallback(db):
    """join_many on a 1-device mesh falls back to sequential joins
    (per-stream OnlineResult list), bit-identical to manual join calls."""
    from fosvos_tpu.evaluation import service
    from fosvos_tpu.parallel import make_mesh

    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    parent = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 48, 3), jnp.float32), train=False)
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    frames, _, _ = ds.load_sequence(raw=True)
    tr = davis.DAVIS2016(mode='train', db_root_dir=db, seq_name='synth-swan')
    _, gt0 = tr.make_img_gt_pair(0)
    mask = (gt0 * 255).astype(np.uint8)

    mesh1 = make_mesh(('seq',), shape=(1,))
    svc = service.VOSService(model, parent, capacity=2, n_epochs=4,
                             avg_grad_every_n=2, mean=ds.meanval,
                             fanout_mesh=mesh1)
    slots, results = svc.join_many(np.stack([frames[0], frames[1]]),
                                   np.stack([mask, mask]), seed=3)
    assert isinstance(results, list) and len(results) == 2
    got = svc.segment(frames[:2])

    svc2 = service.VOSService(model, parent, capacity=2, n_epochs=4,
                              avg_grad_every_n=2, mean=ds.meanval)
    svc2.join(frames[0], mask, seed=3)
    svc2.join(frames[1], mask, seed=4)   # join_many seeds are seed + k
    np.testing.assert_array_equal(got, svc2.segment(frames[:2]))


def test_vos_service_adopt_int8_needs_calibration(db):
    from fosvos_tpu.evaluation import service

    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    parent = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 48, 3), jnp.float32), train=False)
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    frames, _, _ = ds.load_sequence(raw=True)
    svc = service.VOSService(model, parent, capacity=1, int8=True,
                             mean=ds.meanval)
    with pytest.raises(ValueError, match='calib_frame'):
        svc.adopt(parent)
    slot = svc.adopt(parent, calib_frame=frames[0])
    assert svc.segment(frames[:1]).shape == (1, 32, 48)
    assert svc.active_slots == (slot,)


def test_vos_service_adapt_bf16(db):
    """adapt_bf16: the adaptation runs with bf16 activations but the
    adapted params installed into the fleet stay float32, and serving
    works end-to-end."""
    from fosvos_tpu.evaluation import service

    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    parent = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 48, 3), jnp.float32), train=False)
    tr = davis.DAVIS2016(mode='train', db_root_dir=db, seq_name='synth-swan')
    _, gt0 = tr.make_img_gt_pair(0)
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    frames, _, _ = ds.load_sequence(raw=True)

    svc = service.VOSService(model, parent, capacity=1, n_epochs=4,
                             avg_grad_every_n=2, mean=ds.meanval,
                             adapt_bf16=True, augment=False)
    assert svc._adapt_model.dtype == jnp.bfloat16
    slot, res = svc.join(frames[0], gt0, seed=0)
    assert np.isfinite(res.losses).all()
    for leaf in jax.tree.leaves(svc._fleet.get_weights(slot)['params']):
        assert np.asarray(leaf).dtype == np.float32
    out = svc.segment(frames[:1])
    assert out.shape == (1, 32, 48) and out.dtype == np.uint8


def test_elastic_serve_cache_reused_and_invalidated(db):
    """Steady-state serving reuses the gathered bucket trees (no per-frame
    HBM re-gather); any membership or weight change invalidates the cache
    and the next masks are correct."""
    from fosvos_tpu.evaluation import elastic

    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    var_list = [model.init(jax.random.PRNGKey(k), x, train=False)
                for k in range(3)]
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    imgs, _, _ = ds.load_sequence(raw=True)

    ef = elastic.ElasticFleet(model, capacity=4)
    ef.add(var_list[0])
    ef.add(var_list[1])
    m1 = ef.segment(imgs[:2])
    cached = ef._cache_gathered
    assert cached is not None
    m2 = ef.segment(imgs[2:4])
    assert ef._cache_gathered is cached          # steady state: no re-gather
    assert m1.shape == m2.shape

    ef.swap_weights(1, var_list[2])              # weights changed: refresh
    assert ef._cache_gathered is None
    m3 = ef.segment(imgs[:2])
    engine = experiment.InferenceEngine(model, 1)
    np.testing.assert_array_equal(
        m3[1], engine.masks_for_sequence(var_list[2], imgs[1:2])[0])

    ef.remove(0)                                 # membership changed
    assert ef._cache_gathered is None
    m4 = ef.segment(imgs[:1])
    np.testing.assert_array_equal(
        m4[0], engine.masks_for_sequence(var_list[2], imgs[0:1])[0])


def test_int8_engine_frozendict_no_percall_recalibration(db, monkeypatch):
    """FrozenDict-wrapped variables must not defeat the weights-identity
    check: serving the same weights twice calibrates exactly once (a
    ``params``-subtree identity key would see a fresh wrapper per access
    and silently recalibrate every step)."""
    import flax

    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    variables = flax.core.freeze(
        model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 32, 48, 3), jnp.float32), train=False))
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    imgs, _, _ = ds.load_sequence(raw=True)

    engine = experiment.InferenceEngine(model, 1, int8=True)
    calls = []
    real = experiment.InferenceEngine.calibrate
    monkeypatch.setattr(
        experiment.InferenceEngine, 'calibrate',
        lambda self, *a, **kw: (calls.append(1), real(self, *a, **kw))[1])
    m1 = engine.masks_for_sequence(variables, imgs[:1])
    m2 = engine.masks_for_sequence(variables, imgs[1:2])
    assert len(calls) == 1
    assert m1.shape == m2.shape

    # a genuinely different tree still triggers recalibration
    other = flax.core.freeze(
        model.init(jax.random.PRNGKey(1),
                   jnp.zeros((1, 32, 48, 3), jnp.float32), train=False))
    engine.masks_for_sequence(other, imgs[:1])
    assert len(calls) == 2


def test_vos_service_capacity_prechecked_before_adaptation(db, monkeypatch):
    """join/join_many at capacity fail fast — BEFORE spending minutes on
    the one-shot adaptation(s)."""
    from fosvos_tpu.evaluation import service

    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    parent = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 48, 3), jnp.float32), train=False)
    tr = davis.DAVIS2016(mode='train', db_root_dir=db, seq_name='synth-swan')
    _, gt0 = tr.make_img_gt_pair(0)
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    frames, _, _ = ds.load_sequence(raw=True)

    svc = service.VOSService(model, parent, capacity=1, n_epochs=2,
                             avg_grad_every_n=2, mean=ds.meanval,
                             augment=False)
    svc.join(frames[0], gt0, seed=0)

    def boom(*a, **kw):
        raise AssertionError('adaptation ran despite a full fleet')

    monkeypatch.setattr(svc, '_adapt', boom)
    with pytest.raises(ValueError, match='capacity'):
        svc.join(frames[1], gt0)
    with pytest.raises(ValueError, match='free slots'):
        svc.join_many(np.stack([frames[1], frames[2]]),
                      np.stack([gt0, gt0]))
