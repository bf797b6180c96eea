"""Reporting module + offline CLI end-to-end on the fixture."""
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fosvos_tpu.data import synthetic
from fosvos_tpu.evaluation import report
from fosvos_tpu.models import resnet_arch
from fosvos_tpu.runtime import checkpoint


@pytest.fixture(scope='module')
def db(tmp_path_factory):
    return synthetic.generate(str(tmp_path_factory.mktemp('davis')),
                              size=(32, 48))


def _fake_metrics_doc(j=0.8, f=0.75):
    return {'dataset': {'J_mean': j, 'F_mean': f, 'J_recall': 0.9,
                        'J_decay': 0.05, 'F_recall': 0.85, 'F_decay': 0.04},
            'sequences': {'synth-swan': {'J': {'mean': j, 'recall': 1,
                                               'decay': 0},
                                         'F': {'mean': f, 'recall': 1,
                                               'decay': 0}}}}


def test_report_plots(tmp_path):
    import yaml
    m1 = tmp_path / 'a.yml'
    m1.write_text(yaml.dump(_fake_metrics_doc(0.8, 0.75)))
    m2 = tmp_path / 'b.yml'
    m2.write_text(yaml.dump(_fake_metrics_doc(0.6, 0.55)))

    docs = report.load_metrics({'teacher': str(m1), 'student': str(m2)})
    p1 = report.plot_model_comparison(docs, str(tmp_path / 'cmp.png'))
    p2 = report.plot_per_sequence(docs['teacher'],
                                  str(tmp_path / 'seq.png'))
    p3 = report.plot_quality_vs_speed(
        {'teacher': {'j_mean': 0.8, 'fps': 200},
         'student': {'j_mean': 0.6, 'fps': 1500}},
        str(tmp_path / 'qs.png'))
    for p in (p1, p2, p3):
        assert Path(p).stat().st_size > 1000


def test_offline_cli_end_to_end(db, tmp_path, monkeypatch):
    """train_offline CLI with shrunk budgets: trains, snapshots, writes masks."""
    monkeypatch.chdir(tmp_path)
    from fosvos_tpu.cli import train_offline as cli_mod

    orig = cli_mod.OfflineSettings

    def small(**kw):
        kw.update(n_epochs=3, snapshot_every_n=2, batch_size_train=2)
        return orig(**kw)

    monkeypatch.setattr(cli_mod, 'OfflineSettings', small)

    # shrink the model the provider builds (full resnet18 is too slow on CPU)
    from fosvos_tpu.runtime import providers

    def tiny_init(self, arch=None):
        from fosvos_tpu.models import OSVOSResNet
        self.model = OSVOSResNet(arch=arch or resnet_arch(
            18, scale_down_exponent=4))
        variables = self.model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 48, 3), jnp.float32),
            train=False)
        self.variables = dict(variables)
        return self.model

    monkeypatch.setattr(providers.NetworkProvider, 'init_network', tiny_init)

    # --bf16: offline training with bf16 activations (params/BN/losses fp32)
    # --visualize-network: jaxpr + lowered-HLO dumps next to the run
    cli_mod.main(['--network', 'resnet18', '--variant-offline', '11',
                  '--db-root-dir', db, '--bf16', '--visualize-network'])
    assert Path('models/resnet18.jaxpr.txt').stat().st_size > 1000
    assert Path('models/resnet18.hlo.txt').stat().st_size > 1000

    assert checkpoint.exists('models', 'resnet18_11_epoch-1')   # snapshot
    assert checkpoint.exists('models', 'resnet18_11_epoch-2')   # final
    import numpy as np
    saved, _ = checkpoint.load('models', 'resnet18_11_epoch-2')
    leaf = jax.tree.leaves(saved['params'])[0]
    assert np.asarray(leaf).dtype == np.float32   # params stayed fp32
    # testing phase wrote masks for both val sequences
    for seq in ('synth-swan', 'synth-goat'):
        pngs = list(Path(f'results/resnet18/11/offline/{seq}').glob('*.png'))
        assert len(pngs) == 4


def test_variant_grid_resolves_to_presets():
    """Every (offline, online) pair in the sweep grid must resolve through
    the optimizer variant tables to constructible presets (the grid is the
    reference's experiment sweep, src/util/variants.py:7-18)."""
    from fosvos_tpu.train import optimizers
    from fosvos_tpu.train.variants import variants

    assert len(variants) == 70  # 10 offline x 7 online
    for v_off, v_on in variants:
        off = optimizers.offline_variant(v_off)
        on = optimizers.online_variant(v_on)
        for preset in (off, on):
            assert preset.family in ('sgd', 'adam', 'adagrad', 'adadelta',
                                     'adamax')
            assert preset.lr > 0
    # the grid covers only implemented variant ids — out-of-table ids raise
    with pytest.raises(ValueError):
        optimizers.offline_variant(99)


def test_video_grid_compare_cli(db, tmp_path):
    """report CLI: side-by-side overlay video from two results dirs
    (reference notebook cells 29-34)."""
    pytest.importorskip('imageio')
    import cv2
    from click.testing import CliRunner
    from fosvos_tpu.cli import report as report_cli

    frames_dir = Path(db) / 'JPEGImages/480p/synth-swan'
    rng = np.random.RandomState(0)
    for model_name in ('teacher', 'student'):
        d = tmp_path / 'results' / model_name / 'synth-swan'
        d.mkdir(parents=True)
        for f in sorted(frames_dir.glob('*.jpg')):
            cv2.imwrite(str(d / (f.stem + '.png')),
                        rng.randint(0, 255, (32, 48), np.uint8))

    out = tmp_path / 'cmp.gif'
    res = CliRunner().invoke(report_cli.cli, [
        'compare', '--frames-dir', str(frames_dir),
        '--masks', f'teacher={tmp_path}/results/teacher/synth-swan',
        '--masks', f'student={tmp_path}/results/student/synth-swan',
        '--output', str(out)])
    assert res.exit_code == 0, res.output
    assert out.stat().st_size > 1000
    import imageio
    frames = imageio.mimread(str(out))
    assert len(frames) == 4
    # 3 panels (input + 2 models) side by side, plus caption bars
    assert frames[0].shape[1] == 48 * 3
