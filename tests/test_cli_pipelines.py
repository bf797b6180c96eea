"""Smoke tests for the webcam, prune, and mimic CLI pipelines on the fixture
(tiny models via monkeypatched constructors)."""
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fosvos_tpu.data import synthetic
from fosvos_tpu.models import OSVOSResNet, resnet_arch
from fosvos_tpu.runtime import checkpoint


@pytest.fixture(scope='module')
def db(tmp_path_factory):
    return synthetic.generate(str(tmp_path_factory.mktemp('davis')),
                              size=(32, 48))


def _tiny_vars(seed=0):
    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 32, 48, 3), jnp.float32),
                           train=False)
    return model, jax.tree.map(jnp.asarray, variables)


def test_run_webcam_on_video(tmp_path, monkeypatch):
    """Headless video-file inference end-to-end with a tiny checkpoint."""
    import cv2
    # tiny model checkpoint on disk (arch JSON + npz)
    model, variables = _tiny_vars()
    ckpt_dir = tmp_path / 'models'
    checkpoint.save(str(ckpt_dir), 'tiny', variables, model.arch.to_json())

    # 6-frame test video
    video = str(tmp_path / 'clip.avi')
    vw = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*'MJPG'), 8, (48, 32))
    rng = np.random.RandomState(0)
    for _ in range(6):
        vw.write(rng.randint(0, 255, size=(32, 48, 3), dtype=np.uint8))
    vw.release()

    from fosvos_tpu.cli import run_webcam
    run_webcam.main(['--variant', 'prune', '--version', '0',
                     '--model-path', str(ckpt_dir / 'tiny.npz'),
                     '--video', video, '--headless', '--max-frames', '4',
                     '--no-mirror'], standalone_mode=False)


def test_run_webcam_int8_serving(tmp_path):
    """--int8 path: first-frame calibration + quantized forward."""
    import cv2
    model, variables = _tiny_vars()
    ckpt_dir = tmp_path / 'models'
    checkpoint.save(str(ckpt_dir), 'tiny', variables, model.arch.to_json())
    video = str(tmp_path / 'clip.avi')
    vw = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*'MJPG'), 8, (48, 32))
    rng = np.random.RandomState(1)
    for _ in range(4):
        vw.write(rng.randint(0, 255, size=(32, 48, 3), dtype=np.uint8))
    vw.release()

    from fosvos_tpu.cli import run_webcam
    run_webcam.main(['--variant', 'prune', '--version', '0',
                     '--model-path', str(ckpt_dir / 'tiny.npz'),
                     '--video', video, '--headless', '--max-frames', '3',
                     '--no-mirror', '--int8'], standalone_mode=False)

    # segment-fn level: int8 prediction tracks the float prediction
    frame = rng.randint(0, 255, size=(32, 48, 3), dtype=np.uint8)
    sub_f, fetch = run_webcam.make_segment_fn(model, variables, False)
    sub_q, _ = run_webcam.make_segment_fn(model, variables, False, int8=True)
    pf, pq = fetch(sub_f(frame)), fetch(sub_q(frame))
    assert pq.shape == pf.shape
    assert np.mean(np.abs(pq - pf)) < 0.05


def test_run_webcam_get_network_resnet_npz(tmp_path):
    from fosvos_tpu.cli import run_webcam
    model, variables = _tiny_vars()
    # full-resnet default path: store under models/resnet18 with matching arch
    checkpoint.save(str(tmp_path), 'm', variables, model.arch.to_json())
    got_model, got_vars = run_webcam.get_network(
        'prune', 1, str(tmp_path / 'm.npz'))
    outs = got_model.apply(got_vars, jnp.zeros((1, 32, 48, 3), jnp.float32),
                           train=False)
    assert len(outs) == 5


def test_prune_cli_end_to_end(db, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from fosvos_tpu.cli import prune as cli_mod
    from fosvos_tpu.models import arch as arch_mod

    # shrink the model the CLI builds
    monkeypatch.setattr(
        cli_mod, 'resnet_arch',
        lambda v=18, sde=0: arch_mod.resnet_arch(18, scale_down_exponent=4))

    cli_mod.main(['-s', 'synth-swan', '--db-root-dir', db,
                  '--prune-per-iter', '16', '--n-epochs-select', '1',
                  '--n-epochs-finetune', '1', '--percentage-max', '10'])

    stem = 'synth-swan_percentage-10'
    models_dir = ('models/resnet18/11/prune/'
                  'prune_per_iter=16,epochs_select=1,epochs_finetune=1/online')
    assert checkpoint.exists(models_dir, stem)
    # arch JSON says the model shrank
    _, arch_json = checkpoint.load(models_dir, stem)
    small = arch_mod.ResNetArch.from_json(arch_json)
    full = arch_mod.resnet_arch(18, scale_down_exponent=4)
    n_small = small.base_out + sum(sum(b.convs) for st in small.stages
                                   for b in st)
    n_full = full.base_out + sum(sum(b.convs) for st in full.stages
                                 for b in st)
    assert n_small < n_full
    # masks written for the sequence at the checkpoint percentage
    masks = list(Path('results/resnet18/11/prune/'
                      'prune_per_iter=16,epochs_select=1,epochs_finetune=1/'
                      'online/10/synth-swan').glob('*.png'))
    assert len(masks) == 4


def test_mimic_cli_end_to_end(db, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from fosvos_tpu.cli import mimic as cli_mod
    from fosvos_tpu.models import arch as arch_mod

    # teacher checkpoint (tiny widths) + shrink CLI-built archs
    teacher_model, teacher_vars = _tiny_vars(seed=3)
    checkpoint.save('teacher', 't', teacher_vars, teacher_model.arch.to_json())

    real_arch = arch_mod.resnet_arch

    def tiny_arch(version=18, scale_down_exponent=0):
        return real_arch(18, scale_down_exponent=max(scale_down_exponent, 4))

    monkeypatch.setattr(cli_mod, 'resnet_arch', tiny_arch)

    cli_mod.main(['-s', 'synth-swan', '--db-root-dir', db,
                  '--n-epochs', '4', '--scale-down-exponents', '5',
                  '--criterion', 'MSE', '--teacher-path', 'teacher/t.npz'])

    out_base = Path('models/resnet18/11/mimic/'
                    'lr=1.0e-03,criterion=MSE,criterion_from=all,'
                    'learn_from=teacher/online/5/synth-swan')
    assert checkpoint.exists(str(out_base), '4')
    # test() nests a sequence dir under save_dir like the reference
    # (mimic.py:132 + experiment_helper.py:60) -> <seq>/<seq>
    masks = list(Path('results/resnet18/11/mimic/'
                      'lr=1.0e-03,criterion=MSE,criterion_from=all,'
                      'learn_from=teacher/online/5/synth-swan/synth-swan')
                 .glob('*.png'))
    assert len(masks) == 4


class _StubWriter:
    def __init__(self):
        self.tags = {}

    def add_scalar(self, tag, value, step):
        self.tags.setdefault(tag, []).append((step, float(value)))

    def close(self):
        pass


def test_mimic_teacher_resolution(tmp_path):
    """Reference contract (mimic.py:19-30): online mode loads the teacher
    already adapted to the sequence; offline mode the offline parent."""
    from fosvos_tpu.cli import mimic as cli_mod
    model, variables = _tiny_vars()
    d = tmp_path / 'models'
    checkpoint.save(str(d), 'resnet18_11_11_synth-swan_epoch-9999',
                    variables, model.arch.to_json())
    p = cli_mod.resolve_teacher_path('synth-swan', False, models_dir=str(d))
    assert p == str(d / 'resnet18_11_11_synth-swan_epoch-9999')
    # arch JSON in the checkpoint drives the teacher topology
    tm, tv = cli_mod.load_teacher(p)
    assert tm.arch == model.arch
    outs = tm.apply(tv, jnp.zeros((1, 32, 48, 3), jnp.float32), train=False)
    assert len(outs) == 5
    # offline mode -> the offline parent resnet18_11_epoch-239
    checkpoint.save(str(d), 'resnet18_11_epoch-239', variables,
                    model.arch.to_json())
    assert cli_mod.resolve_teacher_path(None, True, models_dir=str(d)) \
        .endswith('resnet18_11_epoch-239')
    # --teacher-path override wins; unknown sequence -> None (fresh init)
    assert cli_mod.resolve_teacher_path('x', False, override='foo',
                                        models_dir=str(d)) == 'foo'
    assert cli_mod.resolve_teacher_path('other-seq', False,
                                        models_dir=str(d)) is None
    # reference .pth naming is also honoured
    (d / 'resnet18_11_11_ref-seq_epoch-9999.pth').write_bytes(b'')
    assert cli_mod.resolve_teacher_path('ref-seq', False, models_dir=str(d)) \
        .endswith('resnet18_11_11_ref-seq_epoch-9999.pth')


def test_mimic_tb_tags_and_multi_shape():
    """train_mimic emits the reference scalar tags (mimic.py:169,182,188)
    and distills over multiple augmented shapes (flip + multi-scale)."""
    from fosvos_tpu.compress import mimic as mimic_lib
    from fosvos_tpu.models import arch as arch_mod
    teacher_model, teacher_vars = _tiny_vars(seed=3)
    student_arch = arch_mod.resnet_arch(18, scale_down_exponent=5)
    student_model = OSVOSResNet(arch=student_arch)
    student_vars = student_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 48, 3), jnp.float32),
        train=False)

    rng = np.random.RandomState(0)
    shapes = [(32, 48), (32, 48), (16, 24), (32, 48), (16, 24)]

    def train_batches():
        for h, w in shapes:   # two scale buckets, like the augmented loader
            yield (rng.randn(1, h, w, 3).astype(np.float32) * 10,
                   (rng.rand(1, h, w, 1) > 0.5).astype(np.float32))

    def val_batches():
        yield (rng.randn(1, 32, 48, 3).astype(np.float32) * 10,
               (rng.rand(1, 32, 48, 1) > 0.5).astype(np.float32))

    writer = _StubWriter()
    mimic_lib.train_mimic(student_model, student_vars,
                          teacher_model, teacher_vars,
                          train_batches, val_batches_fn=val_batches,
                          n_epochs=2, criterion='MSE', validate_every_n=2,
                          summary_writer=writer)
    assert set(writer.tags) == {'total_loss_epoch', 'total_loss_iter',
                                'train/loss', 'val/loss'}
    assert len(writer.tags['total_loss_epoch']) == 2
    # 5 batches/epoch, optimizer step every 5 -> one iter scalar per epoch,
    # at the reference's global index minibatch_idx + n_samples * epoch
    assert [s for s, _ in writer.tags['total_loss_iter']] == [9, 14]
    assert len(writer.tags['val/loss']) == 1


def test_prune_tb_tags(db, tmp_path, monkeypatch):
    """prune_iteratively emits train_pruning/loss and finetune/loss
    (reference prune.py:251,278)."""
    from fosvos_tpu.compress import prune as prune_lib
    from fosvos_tpu.models import arch as arch_mod
    arch = arch_mod.resnet_arch(18, scale_down_exponent=4)
    model = OSVOSResNet(arch=arch)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 48, 3), jnp.float32),
                           train=False)
    rng = np.random.RandomState(0)

    def batches_fn():
        for _ in range(2):
            yield (rng.randn(1, 32, 48, 3).astype(np.float32) * 10,
                   (rng.rand(1, 32, 48, 1) > 0.5).astype(np.float32))

    writer = _StubWriter()
    prune_lib.prune_iteratively(model, arch, variables, batches_fn,
                                is_offline=False, prune_per_iter=16,
                                n_epochs_select=2, n_epochs_finetune=2,
                                percentage_max=10,
                                summary_writer=writer)
    assert set(writer.tags) == {'train_pruning/loss', 'finetune/loss'}
    # reference epoch index: iteration * n_epochs + epoch (1-based)
    assert [s for s, _ in writer.tags['finetune/loss'][:2]] == [1, 2]
    assert all(np.isfinite(v) for _, v in writer.tags['train_pruning/loss'])


def test_gif_convert_folder(tmp_path, monkeypatch):
    """gif CLI walks an arbitrary results tree and mirrors it as gifs."""
    imageio = pytest.importorskip('imageio')
    from click.testing import CliRunner
    from fosvos_tpu.cli import gif as gif_mod

    # two leaf frame dirs at different depths (offline + a prune sweep)
    rng = np.random.RandomState(0)
    for rel in ('resnet18/11/offline/synth-swan',
                'resnet18/11/prune/30/synth-swan'):
        d = tmp_path / 'results' / rel
        d.mkdir(parents=True)
        for i in range(3):
            imageio.imwrite(str(d / f'{i:05d}.png'),
                            rng.randint(0, 255, (16, 24), np.uint8))

    runner = CliRunner()
    res = runner.invoke(gif_mod.convert_folder,
                        ['--results-dir', str(tmp_path / 'results'),
                         '--output-dir', str(tmp_path / 'gifs')])
    assert res.exit_code == 0, res.output
    assert (tmp_path / 'gifs/resnet18/11/offline/synth-swan.gif').exists()
    assert (tmp_path / 'gifs/resnet18/11/prune/30/synth-swan.gif').exists()
    # idempotent: second run skips existing outputs
    res2 = runner.invoke(gif_mod.convert_folder,
                         ['--results-dir', str(tmp_path / 'results'),
                          '--output-dir', str(tmp_path / 'gifs')])
    assert 'wrote 0' in res2.output


def test_fleet_cli_two_streams(tmp_path):
    """Fleet CLI: two tiny adapted checkpoints x two videos, masks written
    per stream and bit-equal to each stream's own single-model engine."""
    import cv2
    from fosvos_tpu.evaluation import experiment

    rng = np.random.RandomState(2)
    specs = []
    frames_per_stream = []
    models = []
    for k, name in enumerate(['walk', 'swan']):
        model, variables = _tiny_vars(seed=k)
        models.append((model, variables))
        ckpt_dir = tmp_path / 'models'
        checkpoint.save(str(ckpt_dir), f'tiny_{name}', variables,
                        model.arch.to_json())
        video = str(tmp_path / f'{name}.avi')
        vw = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*'MJPG'), 8,
                             (48, 32))
        fr = [rng.randint(0, 255, size=(32, 48, 3), dtype=np.uint8)
              for _ in range(4)]
        for f in fr:
            vw.write(f)
        vw.release()
        frames_per_stream.append(video)
        specs += ['--stream', f'{video}={ckpt_dir / f"tiny_{name}.npz"}']

    from fosvos_tpu.cli import fleet as fleet_cli
    out = tmp_path / 'out'
    fleet_cli.main(specs + ['--output-dir', str(out), '--max-frames', '3'],
                   standalone_mode=False)

    for k, name in enumerate(['walk', 'swan']):
        masks = sorted((out / name).glob('*.png'))
        assert len(masks) == 3
        # parity vs the single-model engine on the decoded video frames
        cap = cv2.VideoCapture(frames_per_stream[k])
        ok, frame0 = cap.read()
        cap.release()
        assert ok
        model, variables = models[k]
        engine = experiment.InferenceEngine(model, 1)
        want = engine.masks_for_sequence(variables, frame0[None])
        got = cv2.imread(str(masks[0]), 0)
        np.testing.assert_array_equal(got, want[0])


def test_fleet_cli_mixed_arch_groups(tmp_path):
    """A mixed-topology fleet serves as one compiled program per arch
    group; each stream's mask matches its own single-model engine. With
    --mesh the mixed fleet is rejected (one 'seq' axis, two programs)."""
    import cv2
    from fosvos_tpu.evaluation import experiment

    models, specs = [], []
    for k, (name, sde) in enumerate([('a', 4), ('b', 3)]):
        model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=sde))
        v = model.init(jax.random.PRNGKey(k),
                       jnp.zeros((1, 32, 48, 3), jnp.float32), train=False)
        ckpt_dir = tmp_path / 'models'
        checkpoint.save(str(ckpt_dir), name, jax.tree.map(jnp.asarray, v),
                        model.arch.to_json())
        video = str(tmp_path / f'{name}.avi')
        vw = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*'MJPG'), 8,
                             (48, 32))
        vw.write(np.full((32, 48, 3), 40 * (k + 1), np.uint8))
        vw.release()
        models.append((model, v, video))
        specs += ['--stream', f'{video}={ckpt_dir}/{name}.npz']

    from fosvos_tpu.cli import fleet as fleet_cli
    out = tmp_path / 'out'
    fleet_cli.main(specs + ['--output-dir', str(out), '--max-frames', '1'],
                   standalone_mode=False)

    for name, (model, v, video) in zip(['a', 'b'], models):
        cap = cv2.VideoCapture(video)
        ok, frame0 = cap.read()
        cap.release()
        assert ok
        engine = experiment.InferenceEngine(model, 1)
        want = engine.masks_for_sequence(v, frame0[None])
        got = cv2.imread(str(out / name / '00000.png'), 0)
        np.testing.assert_array_equal(got, want[0])

    import click
    with pytest.raises(click.UsageError, match='mixed-arch'):
        fleet_cli.main(specs + ['--mesh'], standalone_mode=False)


def test_fleet_cli_vgg_network_flag(tmp_path):
    """Checkpoints without an .arch.json resolve through --network
    (vgg16 here); one stream, one frame."""
    import cv2
    from fosvos_tpu.models import OSVOSVGG

    model = OSVOSVGG()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 48, 3), jnp.float32),
                           train=False)
    ckpt_dir = tmp_path / 'models'
    checkpoint.save(str(ckpt_dir), 'v', jax.tree.map(jnp.asarray, variables))
    video = str(tmp_path / 'v.avi')
    vw = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*'MJPG'), 8, (48, 32))
    vw.write(np.zeros((32, 48, 3), np.uint8))
    vw.release()

    from fosvos_tpu.cli import fleet as fleet_cli
    out = tmp_path / 'out'
    fleet_cli.main(['--stream', f'{video}={ckpt_dir}/v.npz',
                    '--network', 'vgg16', '--output-dir', str(out),
                    '--max-frames', '1'], standalone_mode=False)
    assert len(list((out / 'v').glob('*.png'))) == 1

    # --int8: first-frame self-calibration, same wiring end-to-end
    out8 = tmp_path / 'out8'
    fleet_cli.main(['--stream', f'{video}={ckpt_dir}/v.npz',
                    '--network', 'vgg16', '--int8',
                    '--output-dir', str(out8), '--max-frames', '1'],
                   standalone_mode=False)
    assert len(list((out8 / 'v').glob('*.png'))) == 1


def test_fleet_cli_elastic_mixed_lengths(tmp_path):
    """--elastic: streams of different video lengths each run to their own
    EOF (the static fleet stops everyone at the first EOF); every written
    mask matches the stream's own single-model engine."""
    import cv2
    from fosvos_tpu.evaluation import experiment

    rng = np.random.RandomState(5)
    specs, models, stream_frames = [], [], []
    for k, (name, n_frames) in enumerate([('short', 2), ('long', 5)]):
        model, variables = _tiny_vars(seed=k)
        models.append((model, variables))
        ckpt_dir = tmp_path / 'models'
        checkpoint.save(str(ckpt_dir), f'tiny_{name}', variables,
                        model.arch.to_json())
        video = str(tmp_path / f'{name}.avi')
        vw = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*'MJPG'), 8,
                             (48, 32))
        for _ in range(n_frames):
            vw.write(rng.randint(0, 255, size=(32, 48, 3), dtype=np.uint8))
        vw.release()
        # re-decode for the parity check (MJPG is lossy)
        cap = cv2.VideoCapture(video)
        decoded = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            decoded.append(f)
        cap.release()
        assert len(decoded) == n_frames
        stream_frames.append(decoded)
        specs += ['--stream', f'{video}={ckpt_dir / f"tiny_{name}.npz"}']

    from fosvos_tpu.cli import fleet as fleet_cli
    out = tmp_path / 'out'
    fleet_cli.main(specs + ['--output-dir', str(out), '--elastic'],
                   standalone_mode=False)

    for k, (name, n_frames) in enumerate([('short', 2), ('long', 5)]):
        masks = sorted((out / name).glob('*.png'))
        assert len(masks) == n_frames          # ran to its own EOF
        model, variables = models[k]
        engine = experiment.InferenceEngine(model, 1)
        for i, mp in enumerate(masks):
            got = cv2.imread(str(mp), cv2.IMREAD_GRAYSCALE)
            want = engine.masks_for_sequence(
                variables, np.asarray(stream_frames[k][i])[None])
            np.testing.assert_array_equal(got, want[0])

    with pytest.raises(Exception):             # --elastic + --loop rejected
        fleet_cli.main(specs + ['--elastic', '--loop'],
                       standalone_mode=False)


def test_fleet_cli_elastic_mesh_capacity_rounding(tmp_path):
    """--elastic --mesh: 2 streams round their capacity up to the 8-device
    'seq' axis; masks still match the single-model engine."""
    import cv2
    from fosvos_tpu.evaluation import experiment

    model, variables = _tiny_vars(seed=9)
    ckpt_dir = tmp_path / 'models'
    checkpoint.save(str(ckpt_dir), 'tiny', variables, model.arch.to_json())
    rng = np.random.RandomState(7)
    specs = []
    for name in ('a', 'b'):
        video = str(tmp_path / f'{name}.avi')
        vw = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*'MJPG'), 8,
                             (48, 32))
        vw.write(rng.randint(0, 255, size=(32, 48, 3), dtype=np.uint8))
        vw.release()
        specs += ['--stream', f'{video}={ckpt_dir / "tiny.npz"}']

    from fosvos_tpu.cli import fleet as fleet_cli
    out = tmp_path / 'out'
    fleet_cli.main(specs + ['--output-dir', str(out), '--elastic',
                            '--mesh'], standalone_mode=False)
    engine = experiment.InferenceEngine(model, 1)
    for name in ('a', 'b'):
        masks = sorted((out / name).glob('*.png'))
        assert len(masks) == 1
        cap = cv2.VideoCapture(str(tmp_path / f'{name}.avi'))
        ok, frame = cap.read()
        cap.release()
        got = cv2.imread(str(masks[0]), cv2.IMREAD_GRAYSCALE)
        want = engine.masks_for_sequence(variables, frame[None])
        np.testing.assert_array_equal(got, want[0])


def test_fleet_cli_elastic_int8(tmp_path):
    """--elastic --int8: the joining stream calibrates on its first frame
    and serves PTQ masks to its own EOF."""
    import cv2

    model, variables = _tiny_vars(seed=3)
    ckpt_dir = tmp_path / 'models'
    checkpoint.save(str(ckpt_dir), 'tiny', variables, model.arch.to_json())
    video = str(tmp_path / 'v.avi')
    vw = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*'MJPG'), 8,
                         (48, 32))
    rng = np.random.RandomState(11)
    for _ in range(3):
        vw.write(rng.randint(0, 255, size=(32, 48, 3), dtype=np.uint8))
    vw.release()

    from fosvos_tpu.cli import fleet as fleet_cli
    out = tmp_path / 'out'
    fleet_cli.main(['--stream', f'{video}={ckpt_dir / "tiny.npz"}',
                    '--output-dir', str(out), '--elastic', '--int8'],
                   standalone_mode=False)
    masks = sorted((out / 'v').glob('*.png'))
    assert len(masks) == 3
    m0 = cv2.imread(str(masks[0]), cv2.IMREAD_GRAYSCALE)
    assert m0.shape == (32, 48)


def _write_video(path, frames):
    import cv2
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*'MJPG'), 8,
                         (w, h))
    for f in frames:
        vw.write(f)
    vw.release()


def test_serve_cli_end_to_end(db, tmp_path):
    """fosvos-serve: videos + first-frame annotations -> join (one-shot
    adaptation from the parent) -> elastic serve loop -> masks per stream,
    exports under the reference checkpoint naming at EOF. Streams of
    different lengths leave independently."""
    import cv2

    model, parent = _tiny_vars(seed=0)
    ckpt_dir = tmp_path / 'models'
    checkpoint.save(str(ckpt_dir), 'resnet18_11_epoch-239', parent,
                    model.arch.to_json())

    # two streams from the synthetic fixture, different lengths
    from fosvos_tpu.data import davis
    specs = []
    lengths = {'synth-swan': 4, 'synth-goat': 3}
    for seq, n in lengths.items():
        ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name=seq)
        frames, _, _ = ds.load_sequence(raw=True)
        _write_video(tmp_path / f'{seq}.avi', [f for f in frames[:n]])
        tr = davis.DAVIS2016(mode='train', db_root_dir=db, seq_name=seq)
        _, gt0 = tr.make_img_gt_pair(0)
        mask_path = tmp_path / f'{seq}_mask.png'
        cv2.imwrite(str(mask_path), (gt0 * 255).astype(np.uint8))
        specs += ['--stream', f'{tmp_path / f"{seq}.avi"}={mask_path}']

    from fosvos_tpu.cli import serve as serve_cli
    out, exp = tmp_path / 'out', tmp_path / 'export'
    serve_cli.main(['--parent', str(ckpt_dir / 'resnet18_11_epoch-239.npz'),
                    *specs, '--n-epochs', '4', '--avg-grad-every-n', '2',
                    '--no-augment', '--output-dir', str(out),
                    '--export-dir', str(exp)], standalone_mode=False)

    # MJPG re-encodes, so frame counts (not bytes) are the contract
    for seq, n in lengths.items():
        masks = sorted((out / seq).glob('*.png'))
        assert len(masks) == n
        m0 = cv2.imread(str(masks[0]), cv2.IMREAD_GRAYSCALE)
        assert m0.shape == (32, 48)
        assert checkpoint.exists(str(exp), f'resnet18_11_11_{seq}_epoch-3')

    # the adapted masks moved off the parent: serve the same first frame
    # through a parent-only engine and compare
    from fosvos_tpu.evaluation import experiment
    ds = davis.DAVIS2016(mode='test', db_root_dir=db,
                         seq_name='synth-swan')
    frames, _, _ = ds.load_sequence(raw=True)
    cap = cv2.VideoCapture(str(tmp_path / 'synth-swan.avi'))
    ok, f0 = cap.read()
    cap.release()
    assert ok
    engine = experiment.InferenceEngine(model, 1)
    parent_mask = engine.masks_for_sequence(parent, f0[None])[0]
    served = cv2.imread(str(sorted((out / 'synth-swan').glob('*.png'))[0]),
                        cv2.IMREAD_GRAYSCALE)
    assert not np.array_equal(served, parent_mask)


def test_serve_cli_bad_stream_spec(tmp_path):
    model, parent = _tiny_vars(seed=1)
    ckpt_dir = tmp_path / 'models'
    checkpoint.save(str(ckpt_dir), 'p', parent, model.arch.to_json())
    import click
    from fosvos_tpu.cli import serve as serve_cli
    with pytest.raises(click.UsageError, match='VIDEO=FIRST_MASK'):
        serve_cli.main(['--parent', str(ckpt_dir / 'p.npz'),
                        '--stream', 'noequals.avi'], standalone_mode=False)


def test_serve_cli_mesh(db, tmp_path):
    """--mesh: cohort joins fan out over the 'seq' axis and serving runs
    from mesh-sharded fleet buckets (capacity rounds up to the axis)."""
    import cv2

    model, parent = _tiny_vars(seed=5)
    ckpt_dir = tmp_path / 'models'
    checkpoint.save(str(ckpt_dir), 'parent', parent, model.arch.to_json())

    from fosvos_tpu.data import davis
    specs = []
    for seq in ('synth-swan', 'synth-goat'):
        ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name=seq)
        frames, _, _ = ds.load_sequence(raw=True)
        _write_video(tmp_path / f'{seq}.avi', list(frames[:2]))
        tr = davis.DAVIS2016(mode='train', db_root_dir=db, seq_name=seq)
        _, gt0 = tr.make_img_gt_pair(0)
        mask_path = tmp_path / f'{seq}_mask.png'
        cv2.imwrite(str(mask_path), (gt0 * 255).astype(np.uint8))
        specs += ['--stream', f'{tmp_path / f"{seq}.avi"}={mask_path}']

    from fosvos_tpu.cli import serve as serve_cli
    out = tmp_path / 'out'
    serve_cli.main(['--parent', str(ckpt_dir / 'parent.npz'), *specs,
                    '--n-epochs', '4', '--avg-grad-every-n', '2',
                    '--no-augment', '--mesh', '--output-dir', str(out)],
                   standalone_mode=False)
    for seq in ('synth-swan', 'synth-goat'):
        assert len(list((out / seq).glob('*.png'))) == 2
