"""Real-data parity runbook: one command from raw assets to a J&F number.

The repo's absolute-J&F parity with the reference cannot be verified in this
offline environment (no DAVIS-2016, no pretrained trunks — NOTES.md). This
script encodes the full recipe so the day real data lands, the parity number
is ONE command away:

    python tools/parity_runbook.py \
        --db-root-dir /data/DAVIS-2016 \
        --pretrained-path /data/resnet18-torchvision.pth \
        [--offline-ckpt models/resnet18_11_epoch-239(.pth|.npz)] \
        [--fanout] [--work-dir runs/parity]

Stages (mirroring the reference's end-to-end flow, SURVEY.md §3):
  A. parent network: migrate ``--offline-ckpt`` (ours or a reference
     ``.pth``) into the checkpoint naming contract, or train offline from
     the ``--pretrained-path`` trunk (240 epochs);
  B. 20-sequence online sweep (``--fanout`` auto-selects the regime per
     device count) -> adapted checkpoints + predicted masks;
  C. in-repo J&F scoring (``cli/evaluate``) -> toolkit-style metrics YAML;
  D. per-sequence report PNG (``evaluation/report``).

Every stage shells through the SAME CLI entry points a user runs, so the
runbook is also an integration test of the CLI surface; it dry-runs
end-to-end on the synthetic fixture (tests/test_parity_runbook.py).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _migrate_offline_ckpt(offline_ckpt: str, models_dir: Path,
                          network: str, offline_epoch: int) -> None:
    """Land an existing parent checkpoint at the naming-contract stem."""
    from fosvos_tpu.runtime import checkpoint
    from fosvos_tpu.runtime.providers import ResNetOfflineProvider
    from fosvos_tpu.config.settings import OfflineSettings

    stem = checkpoint.checkpoint_stem(network, offline_epoch, 11)
    if checkpoint.exists(str(models_dir), stem):
        print(f'[A] offline parent already in place: {models_dir}/{stem}')
        return
    p = ResNetOfflineProvider(network, str(models_dir), OfflineSettings(),
                              variant_offline=11)
    p.load_model(0, path=offline_ckpt)   # .pth migrates transparently
    p.save_model(offline_epoch)
    print(f'[A] migrated {offline_ckpt} -> {models_dir}/{stem}')


def run_parity(db_root_dir: str, work_dir: str,
               pretrained_path: str = None, offline_ckpt: str = None,
               network: str = 'resnet18',
               n_offline_epochs: int = 240, n_online_epochs: int = 10000,
               fanout: bool = False, bf16: bool = False,
               device_resident: bool = True) -> dict:
    """Run stages A-D inside ``work_dir``; returns the J&F summary dict."""
    from fosvos_tpu.cli import evaluate as evaluate_cli
    from fosvos_tpu.cli import train_offline as offline_cli
    from fosvos_tpu.cli import train_online as online_cli
    from fosvos_tpu.runtime import checkpoint

    # resolve user paths BEFORE chdir so relative --db-root-dir /
    # --pretrained-path / --offline-ckpt keep working from the launch dir
    db_root_dir = str(Path(db_root_dir).resolve())
    if pretrained_path:
        pretrained_path = str(Path(pretrained_path).resolve())
    if offline_ckpt:
        offline_ckpt = str(Path(offline_ckpt).resolve())

    work = Path(work_dir)
    work.mkdir(parents=True, exist_ok=True)
    cwd = os.getcwd()
    os.chdir(work)
    try:
        models_dir = Path('models')
        models_dir.mkdir(exist_ok=True)
        offline_epoch = n_offline_epochs - 1   # final offline snapshot

        # --- A: parent network --------------------------------------------
        stem = checkpoint.checkpoint_stem(network, offline_epoch, 11)
        if offline_ckpt:
            _migrate_offline_ckpt(offline_ckpt, models_dir, network,
                                  offline_epoch)
        elif checkpoint.exists(str(models_dir), stem):
            print(f'[A] reusing existing offline parent: {stem}')
        else:
            print(f'[A] offline training ({n_offline_epochs} epochs)...')
            argv = ['--network', network, '--variant-offline', '11',
                    '--db-root-dir', db_root_dir,
                    '--n-epochs', str(n_offline_epochs), '--no-testing']
            if pretrained_path:
                argv += ['--pretrained-path', pretrained_path]
            if bf16:
                argv += ['--bf16']
            if device_resident:
                # HBM-resident split: ~1 h instead of ~3.6 h for the full
                # 240-epoch budget on one chip (BENCHMARKS.md)
                argv += ['--device-resident']
            offline_cli.main(argv)

        # --- B: online sweep ----------------------------------------------
        print(f'[B] online sweep ({n_online_epochs} steps/sequence)...')
        argv = ['--network', network, '--variant-offline', '11',
                '--variant-online', '11', '--db-root-dir', db_root_dir,
                '--n-epochs', str(n_online_epochs),
                '--offline-epoch', str(offline_epoch), '--skip-done']
        if fanout:
            argv += ['--fanout']
        if bf16:
            argv += ['--bf16']
        online_cli.main(argv)

        # --- C: J&F scoring ------------------------------------------------
        results_dir = Path('results') / network / '11' / '11'
        metrics_yml = 'metrics_parity.yml'
        print(f'[C] scoring {results_dir} ...')
        evaluate_cli.main(['--results-dir', str(results_dir),
                           '--db-root-dir', db_root_dir,
                           '--output', metrics_yml])

        # --- D: report -----------------------------------------------------
        import yaml
        with open(metrics_yml) as f:
            doc = yaml.safe_load(f)
        summary = doc['dataset']
        try:
            from fosvos_tpu.evaluation import report
            png = report.plot_per_sequence(doc, 'parity_per_sequence.png')
            print(f'[D] report: {png}')
        except Exception as e:   # plotting backends are optional
            print(f'[D] report skipped: {e}')
        print('[done] J&F summary:', json.dumps(summary))
        return summary
    finally:
        os.chdir(cwd)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('--db-root-dir', required=True)
    ap.add_argument('--work-dir', default='runs/parity')
    ap.add_argument('--pretrained-path', default=None,
                    help='torchvision trunk .pth (stage A training)')
    ap.add_argument('--offline-ckpt', default=None,
                    help='existing parent checkpoint (.pth migrates); '
                         'skips offline training')
    ap.add_argument('--network', default='resnet18',
                    choices=['resnet18', 'resnet34', 'vgg16'])
    ap.add_argument('--n-offline-epochs', default=240, type=int)
    ap.add_argument('--n-online-epochs', default=10000, type=int)
    ap.add_argument('--fanout', action='store_true')
    ap.add_argument('--bf16', action='store_true')
    ap.add_argument('--no-device-resident', action='store_true',
                    help='offline stage: use the standard loader loop '
                         'instead of the HBM-resident dataset mode')
    a = ap.parse_args(argv)
    run_parity(a.db_root_dir, a.work_dir,
               pretrained_path=a.pretrained_path,
               offline_ckpt=a.offline_ckpt, network=a.network,
               n_offline_epochs=a.n_offline_epochs,
               n_online_epochs=a.n_online_epochs,
               fanout=a.fanout, bf16=a.bf16,
               device_resident=not a.no_device_resident)


if __name__ == '__main__':
    main()
