"""Runtime subsystems + CLI pipelines on the synthetic fixture."""
import os
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fosvos_tpu.config.settings import (OfflineSettings, OnlineSettings,
                                        write_settings)
from fosvos_tpu.data import davis, synthetic
from fosvos_tpu.models import OSVOSResNet, resnet_arch
from fosvos_tpu.runtime import checkpoint
from fosvos_tpu.runtime.providers import (ResNetOnlineProvider,
                                          provider_mapping)


@pytest.fixture(scope='module')
def db(tmp_path_factory):
    return synthetic.generate(str(tmp_path_factory.mktemp('davis')), size=(32, 48))


def test_checkpoint_roundtrip(tmp_path):
    variables = {'params': {'a': {'kernel': np.arange(6.).reshape(2, 3)},
                            'b': {'bias': np.zeros(4)}},
                 'batch_stats': {'bn': {'mean': np.ones(3)}}}
    stem = checkpoint.checkpoint_stem('resnet18', 239, variant_offline=11)
    assert stem == 'resnet18_11_epoch-239'
    checkpoint.save(str(tmp_path), stem, variables, arch_json='{"x": 1}')
    loaded, arch = checkpoint.load(str(tmp_path), stem)
    assert arch == '{"x": 1}'
    np.testing.assert_array_equal(loaded['params']['a']['kernel'],
                                  variables['params']['a']['kernel'])
    np.testing.assert_array_equal(loaded['batch_stats']['bn']['mean'],
                                  np.ones(3))
    assert checkpoint.exists(str(tmp_path), stem)
    assert not checkpoint.exists(str(tmp_path), 'nope')


def test_checkpoint_stem_online_sequence():
    stem = checkpoint.checkpoint_stem('resnet18', 9999, 11, 11, 'blackswan')
    assert stem == 'resnet18_11_11_blackswan_epoch-9999'


def test_write_settings_yaml(tmp_path):
    import yaml
    s = OnlineSettings(variant_offline=11, variant_online=11)
    path = write_settings(str(tmp_path), 'resnet18', s, 11, 11)
    assert Path(path).name.startswith('resnet18_11_11_settings_')
    doc = yaml.safe_load(Path(path).read_text())
    assert doc['n_epochs'] == 10000
    assert doc['avg_grad_every_n'] == 5


def test_provider_save_load_roundtrip(tmp_path):
    settings = OnlineSettings(n_epochs=9)
    p = ResNetOnlineProvider('resnet18', str(tmp_path), settings,
                             variant_offline=11, variant_online=11)
    p.init_network(resnet_arch(18, scale_down_exponent=4))
    p.variables = jax.tree.map(jnp.asarray, p.variables)
    path = p.save_model(9, sequence='synth-swan')
    assert 'resnet18_11_11_synth-swan_epoch-9' in path

    p2 = ResNetOnlineProvider('resnet18', str(tmp_path), settings,
                              variant_offline=11, variant_online=11)
    p2.load_model(9, sequence='synth-swan')
    np.testing.assert_array_equal(
        np.asarray(p2.variables['params']['layer_fuse']['kernel']),
        np.asarray(p.variables['params']['layer_fuse']['kernel']))
    # arch restored from JSON (width-4 student, not default 18)
    assert p2.model.arch.base_out == 4


def test_provider_load_model_explicit_path(tmp_path):
    """--model-path style loads: an explicit path (with or without .npz)
    overrides the naming-convention stem (used by cli/prune)."""
    settings = OnlineSettings(n_epochs=9)
    p = ResNetOnlineProvider('resnet18', str(tmp_path), settings,
                             variant_offline=11, variant_online=11)
    p.init_network(resnet_arch(18, scale_down_exponent=4))
    p.variables = jax.tree.map(jnp.asarray, p.variables)
    path = p.save_model(240)

    # different variants => different default stem; the path must win
    p2 = ResNetOnlineProvider('resnet18', str(tmp_path), settings,
                              variant_offline=0, variant_online=0)
    p2.load_model(0, path=path)                       # with .npz suffix
    np.testing.assert_array_equal(
        np.asarray(p2.variables['params']['layer_fuse']['kernel']),
        np.asarray(p.variables['params']['layer_fuse']['kernel']))
    p3 = ResNetOnlineProvider('resnet18', str(tmp_path), settings,
                              variant_offline=0, variant_online=0)
    p3.load_model(0, path=path[:-len('.npz')])        # without suffix
    assert p3.model.arch.base_out == 4


def test_provider_migrates_reference_pth(tmp_path):
    """A reference-format .pth state_dict loads transparently."""
    import torch
    from tests.test_import_torch import _reference_osvos_resnet18_sd
    rng = np.random.RandomState(0)
    sd = {k: torch.as_tensor(v)
          for k, v in _reference_osvos_resnet18_sd(rng).items()}
    pth = tmp_path / 'resnet18_11_epoch-239.pth'
    torch.save(sd, str(pth))

    p = ResNetOnlineProvider('resnet18', str(tmp_path), OnlineSettings())
    p.load_model(0, path=str(pth))
    outs = p.model.apply(p.variables, jnp.zeros((1, 32, 48, 3), jnp.float32),
                         train=False)
    assert len(outs) == 5


def test_vgg_provider_caffe_trunk(tmp_path):
    """--pretrained-caffe path: VGGOfflineProvider initializes the trunk from
    a (synthetic) vgg_hed_caffe.mat — the reference's pretrained=2 /
    is_loading_vgg_caffe branch (osvos_vgg.py:139-153)."""
    import scipy.io
    from fosvos_tpu.runtime.providers import VGGOfflineProvider

    rng = np.random.RandomState(7)
    cfg = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    in_ch = 3
    weights, biases = [], []
    for out in cfg:
        w_torch = rng.randn(out, in_ch, 3, 3).astype(np.float64)
        weights.append(w_torch.transpose())
        biases.append(rng.randn(out, 1).astype(np.float64))
        in_ch = out
    w_cell = np.empty((1, len(weights)), dtype=object)
    b_cell = np.empty((1, len(biases)), dtype=object)
    for k in range(len(weights)):
        w_cell[0, k] = weights[k]
        b_cell[0, k] = biases[k]
    mat = tmp_path / 'vgg_hed_caffe.mat'
    scipy.io.savemat(str(mat), {'weights': w_cell, 'biases': b_cell})

    settings = OfflineSettings(start_epoch=0, is_loading_vgg_caffe=True)
    p = VGGOfflineProvider('vgg16', str(tmp_path), settings,
                           caffe_path=str(mat))
    p.load_network_train()
    got = np.asarray(p.variables['params']['stage0_conv0']['kernel'])
    want = weights[0].transpose()   # torch (out,in,kh,kw)
    assert got[1, 2, 0, 5] == np.float32(want[5, 0, 1, 2])
    outs = p.model.apply({'params': p.variables['params']},
                         jnp.zeros((1, 33, 49, 3), jnp.float32))
    assert len(outs) == 5


def test_provider_mapping_complete():
    nets = ['vgg16', 'resnet18', 'resnet34',
            # beyond the reference CLI: the full resnet family
            'resnet50', 'resnet101', 'resnet152']
    assert set(provider_mapping) == {(mode, net) for mode in
                                     ('offline', 'online') for net in nets}


def test_resnet50_provider_roundtrip(tmp_path):
    """The bottleneck family is reachable end-to-end through the provider
    registry: init, save with arch JSON, reload, tiny forward."""
    import jax
    import jax.numpy as jnp
    from fosvos_tpu.config.settings import OfflineSettings

    settings = OfflineSettings(n_epochs=1)
    provider = provider_mapping[('offline', 'resnet50')](
        'resnet50', str(tmp_path), settings, variant_offline=11, version=50)
    provider.init_network()
    assert provider.model.arch.version == 50
    assert provider.model.arch.block == 'bottleneck'
    provider.save_model(0)
    provider.load_model(0)
    out = provider.model.apply(provider.variables,
                               jnp.zeros((1, 32, 48, 3), jnp.float32),
                               train=False)
    assert out[-1].shape == (1, 32, 48, 1)


def test_online_cli_end_to_end(db, tmp_path, monkeypatch):
    """Full train_online CLI path on the fixture with shrunk budgets."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        'fosvos_tpu.data.davis.VAL_SEQUENCES', ['synth-swan'])

    from fosvos_tpu.cli import train_online as cli_mod

    # shrink the run: patch settings constructed in main via argv + monkeypatch
    orig_settings = cli_mod.OnlineSettings

    def small_settings(**kw):
        kw.update(n_epochs=12, snapshot_every_n=12)
        return orig_settings(**kw)

    monkeypatch.setattr(cli_mod, 'OnlineSettings', small_settings)
    monkeypatch.setattr(cli_mod, 'VAL_SEQUENCES', ['synth-swan'])

    # the provider needs an offline parent checkpoint to start from: fake one
    settings = small_settings(is_training=True, is_testing=True,
                              variant_offline=11, variant_online=11)
    seed_provider = ResNetOnlineProvider('resnet18', 'models', settings,
                                         variant_offline=11,
                                         variant_online=11)
    seed_provider.init_network(resnet_arch(18, scale_down_exponent=4))
    seed_provider.variables = jax.tree.map(jnp.asarray,
                                           seed_provider.variables)
    Path('models').mkdir(exist_ok=True)
    seed_provider.save_model(239)  # offline_epoch default (= final offline
    # snapshot, epoch n_epochs-1)

    cli_mod.main(['--network', 'resnet18', '--variant-offline', '11',
                  '--variant-online', '11', '-s', 'synth-swan',
                  '--db-root-dir', db, '--int8'])  # int8 test-phase serving

    # adapted checkpoint + masks exist
    assert checkpoint.exists('models', 'resnet18_11_11_synth-swan_epoch-11')
    masks = sorted(Path('results/resnet18/11/11/synth-swan').glob('*.png'))
    assert len(masks) == 4


def test_fanout_regime_selection():
    """Auto-regime: fan-out only when sequences fit on the mesh and there
    is an adaptation to parallelize (VERDICT r2 item 9)."""
    from fosvos_tpu.cli.train_online import select_regime
    assert select_regime(8, 8, True, True) == 'fanout'
    assert select_regime(4, 8, True, True) == 'fanout'
    # more sequences than devices -> sequential (2.2x HBM-churn penalty)
    assert select_regime(20, 1, True, True) == 'sequential'
    assert select_regime(20, 8, True, True) == 'sequential'
    # --no-training: nothing to fan out
    assert select_regime(8, 8, True, False) == 'sequential'
    # not requested / single sequence
    assert select_regime(8, 8, False, True) == 'sequential'
    assert select_regime(1, 8, True, True) == 'sequential'


def test_adaptation_model_bf16_clone():
    """--bf16 adaptation clones the model with bfloat16 activations; without
    it the provider's fp32 model is used unchanged."""
    import jax.numpy as jnp
    from types import SimpleNamespace
    from fosvos_tpu.cli.train_online import adaptation_model
    from fosvos_tpu.models import make_resnet

    model = make_resnet(18, scale_down_exponent=4)
    provider = SimpleNamespace(model=model)
    s = OnlineSettings(variant_offline=11, variant_online=11)
    assert adaptation_model(provider, s) is model
    s.bf16 = True
    clone = adaptation_model(provider, s)
    assert clone.dtype == jnp.bfloat16
    assert clone.arch == model.arch


def test_evaluate_cli(db, tmp_path, monkeypatch):
    """J&F CLI on perfect (ground-truth) masks -> J=F=1."""
    import cv2
    results = tmp_path / 'results'
    ds = davis.DAVIS2016(mode='test', db_root_dir=db)
    for s in ds.samples:
        out = results / s.seq_name
        out.mkdir(parents=True, exist_ok=True)
        ann = cv2.imread(s.label_path, 0)
        cv2.imwrite(str(out / f'{s.fname}.png'), ann)

    from fosvos_tpu.cli import evaluate
    ev = evaluate.evaluate_results(str(results), db)
    s = ev.summary()
    assert s['J_mean'] == 1.0 and s['F_mean'] == 1.0

    out_yaml = tmp_path / 'metrics.yml'
    evaluate.main(['--results-dir', str(results), '--db-root-dir', db,
                   '--output', str(out_yaml)])
    import yaml
    doc = yaml.safe_load(out_yaml.read_text())
    assert doc['dataset']['J_mean'] == 1.0
    assert 'synth-swan' in doc['sequences']


def test_visualize_network(tmp_path):
    from fosvos_tpu.runtime.visualize import visualize_network
    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 48, 3), jnp.float32),
                           train=False)
    out = visualize_network(model, variables, input_shape=(1, 32, 48, 3),
                            out_dir=str(tmp_path))
    assert Path(out['jaxpr']).exists()
    assert 'conv' in Path(out['hlo']).read_text().lower()


def test_warmup_cli_populates_cache(tmp_path, monkeypatch):
    """fosvos-warmup executes every production program (serve incl. int8,
    the adaptation scans incl. QAT, the webcam step) at the requested
    shapes and the persistent XLA cache gains entries — later processes
    skip the multi-minute 480p compiles.

    Runs mid-suite, after other tests have already compiled into the
    conftest cache dir: this exercises the re-pointing path
    (``device._repoint_persistent_cache``) — jax's persistent-cache
    singleton initializes once per process, so without the reset the CLI's
    ``--cache-dir`` would silently keep writing to the old directory."""
    monkeypatch.chdir(tmp_path)
    cache = tmp_path / 'xla-cache'
    from fosvos_tpu.cli import warmup as cli_mod
    from fosvos_tpu.runtime.device import enable_compilation_cache

    suite_cache_dir = jax.config.jax_compilation_cache_dir
    # on-disk entries are written only on a compile MISS; earlier suite
    # tests may have compiled these same tiny programs into the in-memory
    # executable cache, so drop it to force real compiles here
    jax.clear_caches()

    try:
        cli_mod.main(['--network', 'resnet18', '--scale-down-exponent', '4',
                      '--height', '32', '--width', '48',
                      '--batch-size-test', '2', '--n-epochs', '12',
                      '--serve', '--adapt', '--webcam', '--int8',
                      '--qat-int8', '--fleet-capacity', '2',
                      '--cache-dir', str(cache)])
        entries = list(cache.iterdir()) if cache.exists() else []
        assert entries, 'warmup must leave compiled programs in the cache'
    finally:
        # hand the suite its cache back (tmp_path is deleted after this
        # test; leaving the singleton pointed there would both lose the
        # suite's warm cache and write into a vanished directory)
        enable_compilation_cache(suite_cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)


def test_enable_compilation_cache_repoints_after_use(tmp_path):
    """Re-pointing the persistent cache AFTER a compile has initialized it
    must take effect (jax initializes the cache singleton once; the no-op
    config update was the root cause of fosvos-warmup warming the wrong
    cache in warm processes)."""
    from fosvos_tpu.runtime.device import enable_compilation_cache

    suite_cache_dir = jax.config.jax_compilation_cache_dir
    a, b = tmp_path / 'cache_a', tmp_path / 'cache_b'
    try:
        enable_compilation_cache(str(a))
        jax.clear_caches()
        jax.jit(lambda x: x * 2.0 + 1.0)(jnp.arange(7.0)).block_until_ready()
        assert list(a.iterdir()), 'first dir must receive the entry'

        enable_compilation_cache(str(b))
        jax.clear_caches()
        jax.jit(lambda x: x * 3.0 - 2.0)(jnp.arange(9.0)).block_until_ready()
        assert list(b.iterdir()), 're-pointed dir must receive entries'
    finally:
        enable_compilation_cache(suite_cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)


def test_warm_fleet_covers_non_pow2_capacity(tmp_path, monkeypatch):
    """warm_fleet walks the fleet's REAL bucket ladder — including the
    capacity-sized top bucket a non-power-of-two fleet serves at full
    load (elastic._bucket_sizes appends capacity itself)."""
    monkeypatch.chdir(tmp_path)
    from fosvos_tpu.cli import warmup as cli_mod
    from fosvos_tpu.data.davis import DAVIS_MEAN_BGR
    from fosvos_tpu.evaluation import elastic

    model, variables = cli_mod.build_model('resnet18',
                                           scale_down_exponent=4)
    segmented = []
    orig = elastic.ElasticFleet.segment

    def spy(self, frames):
        segmented.append(frames.shape[0])
        return orig(self, frames)

    monkeypatch.setattr(elastic.ElasticFleet, 'segment', spy)
    cli_mod.warm_fleet(model, variables, 32, 48, capacity=3,
                       bf16=False, int8=False, mean=DAVIS_MEAN_BGR)
    assert segmented == [1, 2, 3]
