"""CI dry-run of the real-data parity runbook on the synthetic fixture
(tools/parity_runbook.py): stages A-D end-to-end with tiny budgets."""
import importlib.util
import sys
from pathlib import Path

import pytest

from fosvos_tpu.data import synthetic


def _load_runbook():
    path = Path(__file__).resolve().parent.parent / 'tools' \
        / 'parity_runbook.py'
    spec = importlib.util.spec_from_file_location('parity_runbook', path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules['parity_runbook'] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def db(tmp_path_factory):
    return synthetic.generate(str(tmp_path_factory.mktemp('davis')),
                              size=(32, 48))


def test_parity_runbook_synthetic(db, tmp_path, monkeypatch):
    from fosvos_tpu.models import arch as arch_mod

    # shrink every model the CLIs construct
    monkeypatch.setattr(
        'fosvos_tpu.runtime.providers.resnet_arch',
        lambda v=18: arch_mod.resnet_arch(18, scale_down_exponent=4))
    monkeypatch.setattr('fosvos_tpu.cli.train_online.VAL_SEQUENCES',
                        ['synth-swan', 'synth-goat'])

    runbook = _load_runbook()
    summary = runbook.run_parity(
        db, str(tmp_path / 'parity'),
        n_offline_epochs=2, n_online_epochs=6)

    assert set(summary) >= {'J_mean', 'F_mean'}
    assert 0.0 <= summary['J_mean'] <= 1.0
    # artifacts in place: offline parent, adapted ckpts, masks, YAML, report
    work = tmp_path / 'parity'
    assert (work / 'models' / 'resnet18_11_epoch-1.npz').exists()
    assert (work / 'models'
            / 'resnet18_11_11_synth-swan_epoch-5.npz').exists()
    assert len(list((work / 'results/resnet18/11/11/synth-goat')
                    .glob('*.png'))) == 4
    assert (work / 'metrics_parity.yml').exists()

    # idempotent re-run: stage A reuses the parent, --skip-done skips B
    summary2 = runbook.run_parity(db, str(tmp_path / 'parity'),
                                  n_offline_epochs=2, n_online_epochs=6)
    assert summary2.keys() == summary.keys()
