"""The compression quality-vs-speed curve, end-to-end on one chip.

This produces the reference's *results deliverable*: per prune-percentage
and per mimic-width checkpoints of {measured fps, J&F}, plus the prune
pipeline's own wall-clock — the reference snapshots + speed-tests +
mask-tests each 10% prune checkpoint (``/root/reference/src/prune.py:588-640``),
evals each mimic student (``src/mimic.py:121-141``), and renders the
metric-vs-speed scatter in its notebook (``src/eval/visualizations.ipynb``
cells 27-28). The reference's own YAMLs were produced externally and never
committed; here the whole chain — adapt, prune/distill, serve, score — runs
in-repo on a synthetic 480p DAVIS sequence (no DAVIS data or pretrained
trunks exist in this environment; see BENCHMARKS.md "Quality").

Pipeline (per-sequence / online mode, the reference's ``-s <seq>`` story):

1. synthesize a 480p DAVIS tree (one val sequence, N frames);
2. one-shot-adapt a fresh OSVOS-ResNet18 to frame 0 (the production
   10k-step budget) -> the "parent" = the teacher and the prune input.
   (Deviation, documented: the reference prunes the torchvision-pretrained
   trunk, ``prune.py:33-43``; no torchvision weights exist here, and
   pruning the adapted specialist is the production serving flow.)
3. prune 10%..90% with the real pipeline (rank/fine-tune on the sequence's
   augmented first frame, reference cadence); at each checkpoint:
   materialized-arch fps (b1, pipelined fence), masks, in-repo J&F, params;
4. mimic sde 0..6: distill each student from the adapted teacher
   (reference online-mode budget), then fps + masks + J&F per student;
5. write curve.json + curve.md + the quality-vs-speed scatter PNG
   (evaluation/report.py), and one standard JSON metric line per point.

Run (first run compiles ~9 pruned + 7 student 480p programs — budget
60-120 min behind the tunnel; reruns hit the persistent XLA cache):

  PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_compression_curve.py \
      --out-dir docs/compression_curve
"""
import argparse
import dataclasses
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fosvos_tpu.runtime.device import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from fosvos_tpu.compress import mimic as mimic_lib
from fosvos_tpu.compress import prune as prune_lib
from fosvos_tpu.data import davis, synthetic, transforms
from fosvos_tpu.evaluation import experiment, report
from fosvos_tpu.models import OSVOSResNet, make_resnet, resnet_arch
from fosvos_tpu.train import online, optimizers

SEQ = 'synth-swan'


class TimingWriter:
    """tensorboardX-like writer recording (tag, value, wall-time) events so
    the prune pipeline's per-epoch costs can be decomposed afterwards."""

    def __init__(self):
        self.events = []

    def add_scalar(self, tag, value, step):
        self.events.append((tag, float(value), time.perf_counter()))

    def close(self):
        pass

    def epoch_cost(self, tag: str) -> float:
        """Median wall-clock between consecutive ``tag`` events — within an
        iteration those are back-to-back epochs; the cross-iteration gaps
        (which contain the other phase) are outliers the median rejects."""
        ts = [t for tg, _, t in self.events if tg == tag]
        if len(ts) < 2:
            return float('nan')
        return float(np.median(np.diff(ts)))


def n_params(variables) -> int:
    return int(sum(np.asarray(l).size
                   for l in jax.tree_util.tree_leaves(variables['params'])))


def measure_point(name, model, variables, db_test, out_root, bench_runs):
    """One curve point: b1 fps (pipelined fence) + masks + J&F.

    One engine serves both the speed and the mask pass (same compiled
    program); uint8 ingest, fp32 numerics (the reference's serving dtype,
    so the quality axis is apples-to-apples across checkpoints)."""
    engine = experiment.InferenceEngine(model, batch_size=1,
                                        mean=db_test.meanval)
    variables = jax.device_put(variables)
    out_dir = str(Path(out_root) / 'results' / name)
    speed = experiment.test(model, variables, db_test, out_dir, seq_name=SEQ,
                            eval_speeds=True, engine=engine)
    experiment.test(model, variables, db_test, out_dir, seq_name=SEQ,
                    engine=engine)
    from fosvos_tpu.cli.evaluate import evaluate_results
    ev = evaluate_results(out_dir, db_test.db_root_dir).per_sequence[SEQ]
    fps = speed[SEQ].fps
    return {'fps_b1': round(fps, 1),
            'j_mean': round(ev.j.mean, 4), 'j_recall': round(ev.j.recall, 4),
            'j_decay': round(ev.j.decay, 4),
            'f_mean': round(ev.f.mean, 4),
            'n_params': n_params({'params': variables['params']})}


def write_artifacts(doc: dict, out: Path):
    """curve.json is the raw record; curve.md is the human deliverable
    (reference analogue: visualizations.ipynb cells 27-28's scatter+bars)."""
    (out / 'curve.json').write_text(json.dumps(doc, indent=1))

    points, wall, cfg = doc['points'], doc['wall_clock'], doc['config']
    report.plot_quality_vs_speed(
        {k: {'fps': p['fps_b1'], 'j_mean': p['j_mean']}
         for k, p in points.items()},
        str(out / 'quality_vs_speed.png'))

    lines = [
        '# Compression quality-vs-speed curve',
        '',
        'The reference\'s results deliverable (`src/eval/visualizations.ipynb`'
        ' cells 27-28), produced end-to-end on one TPU chip: one-shot-adapt a'
        ' parent OSVOS-ResNet18, then run the full prune pipeline'
        f" (10..{cfg['percentage_max']}% in 10% checkpoints) and the full"
        f" mimic sweep (sde {cfg['sdes']}), measuring each checkpoint's"
        ' serving speed (batch-1, pipelined fence, uint8 ingest, fp32) and'
        ' in-repo J&F on the held-out frames.',
        '',
        f"Setup: synthetic {cfg['height']}x{cfg['width']} DAVIS sequence"
        f" ({cfg['n_frames']} frames — no DAVIS data or pretrained trunks"
        ' exist in this environment, see BENCHMARKS.md "Quality");'
        f" production budgets ({cfg['adapt_steps']} adaptation steps,"
        f" {cfg['n_epochs_select']}+{cfg['n_epochs_finetune']} prune"
        f" rank/fine-tune epochs per {cfg['prune_per_iter']}-filter"
        f" iteration, {cfg['mimic_epochs']} distillation epochs per"
        ' student). Reproduce with:',
        '',
        '```',
        'PYTHONPATH=/root/.axon_site:/root/repo \\',
        '  python tools/bench_compression_curve.py --out-dir '
        + str(out),
        '```',
        '',
        '| checkpoint | fps (b1) | J mean | F mean | params |',
        '|---|---|---|---|---|',
    ]
    for k, p in points.items():
        lines.append(f"| {k} | {p['fps_b1']} | {p['j_mean']} | "
                     f"{p['f_mean']} | {p['n_params'] / 1e6:.2f}M |")
    lines += [
        '',
        '## Pipeline wall-clock (on-chip, one v5e chip behind the tunnel)',
        '',
        f"| phase | s |",
        '|---|---|',
        f"| one-shot adaptation ({cfg['adapt_steps']} steps) | "
        f"{wall.get('adapt_s', 'n/a')} |",
    ]
    if 'prune_pipeline_s' in wall:
        lines += [
            f"| prune pipeline total (10..{cfg['percentage_max']}%) | "
            f"{wall['prune_pipeline_s']} |",
            f"| prune rank epoch (median) | {wall['prune_rank_epoch_s']} |",
            f"| prune fine-tune epoch (median) | "
            f"{wall['prune_finetune_epoch_s']} |",
        ]
    dist = [(k, p['distill_s']) for k, p in points.items()
            if 'distill_s' in p]
    for k, s in dist:
        lines.append(f'| distill {k} ({cfg["mimic_epochs"]} epochs) | {s} |')
    lines.append(f"| **total** | **{wall['total_s']}** |")
    if 'prune_s_per_checkpoint' in wall:
        per = ', '.join(f'{p}%: {t}s'
                        for p, t in wall['prune_s_per_checkpoint'].items())
        lines += ['', f'Per-10%-checkpoint prune cost: {per}. The first '
                  'checkpoint carries the 480p rank/fine-tune compiles; '
                  'later ones are re-rank + re-tune only (shape-stable '
                  'masked training, no recompiles).']
    lines += [
        '',
        '## Reading the curve',
        '',
        '- The speed axis is real: fps is measured per materialized '
        'checkpoint architecture with the same pipelined-fence protocol as '
        'bench.py, so the fps spread (~470-640 fps) is the true b1 serving '
        'cost of each width. b1 at 480p is latency-bound on this chip '
        '(BENCHMARKS.md "batch-1 latency"), so fps grows far more slowly '
        'than parameter count shrinks — the same conclusion the reference '
        'draws for small batches on GPU.',
        '- The quality axis is J&F on ONE synthetic sequence adapted with '
        'per-sequence budgets: the relative trend (quality holds through '
        'moderate compression, collapses at extreme width reduction) is '
        'meaningful; absolute values are NOT comparable to DAVIS-val '
        'numbers (`tools/parity_runbook.py` reproduces those given real '
        'assets).',
        '- Aggressive checkpoints (prune>=60%, sde>=3) are high-variance at '
        'this budget: a single synthetic sequence gives the rank/distill '
        'loss few gradients to distinguish channels, so individual points '
        'can collapse (e.g. a bad 10%-filter selection) while a yet-smaller '
        'one recovers. The reference smooths this with 50-sequence sweeps; '
        'the per-sequence instability itself is faithful.',
    ]
    (out / 'curve.md').write_text('\n'.join(lines) + '\n')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out-dir', default='docs/compression_curve')
    ap.add_argument('--render-only', action='store_true',
                    help='re-render curve.md + PNG from an existing '
                         'curve.json (no TPU work)')
    ap.add_argument('--adapt-steps', type=int, default=10000)
    ap.add_argument('--prune-per-iter', type=int, default=64)
    ap.add_argument('--n-epochs-select', type=int, default=20)
    ap.add_argument('--n-epochs-finetune', type=int, default=20)
    ap.add_argument('--percentage-max', type=int, default=90)
    ap.add_argument('--mimic-epochs', type=int, default=200)
    ap.add_argument('--sdes', default='0,1,2,3,4,5,6')
    ap.add_argument('--n-frames', type=int, default=6)
    ap.add_argument('--height', type=int, default=480)
    ap.add_argument('--width', type=int, default=854)
    ap.add_argument('--bench-runs', type=int, default=10)
    ap.add_argument('--skip-prune', action='store_true')
    ap.add_argument('--skip-mimic', action='store_true')
    args = ap.parse_args()

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    if args.render_only:
        write_artifacts(json.loads((out / 'curve.json').read_text()), out)
        print(f'wrote {out}/curve.md, quality_vs_speed.png', flush=True)
        return
    root = tempfile.mkdtemp(prefix='curve_davis_')
    synthetic.generate(root, sequences=['synth-bear'], val_sequences=[SEQ],
                       n_frames=args.n_frames,
                       size=(args.height, args.width))
    db_train = davis.DAVIS2016(mode='train', db_root_dir=root, seq_name=SEQ)
    db_test = davis.DAVIS2016(mode='test', db_root_dir=root, seq_name=SEQ)

    t_all = time.perf_counter()
    model = make_resnet(18)
    variables = jax.device_put(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32),
        train=False))

    # --- 1. the parent: one-shot adaptation at the production budget ------
    tuner = online.OnlineFinetuner(model, optimizers.online_variant(11),
                                   avg_grad_every_n=5)
    img, gt = db_train.make_img_gt_pair(0)
    res = tuner.finetune(variables, img, gt, n_epochs=args.adapt_steps)
    adapted = {'params': res.state.params,
               'batch_stats': res.state.batch_stats}
    print(f'adapted parent: {res.wall_time_s:.1f} s '
          f'({args.adapt_steps} steps)', flush=True)

    points = {}
    wall = {'adapt_s': round(res.wall_time_s, 1)}
    points['parent'] = measure_point('parent', model, adapted, db_test,
                                     root, args.bench_runs)
    print(f"parent: {points['parent']}", flush=True)

    # --- 2. prune 10..90%, reference cadence ------------------------------
    if not args.skip_prune:
        aug_rng = np.random.RandomState(0)

        def batches_fn():
            return transforms.augmented_frame_stream(db_train, aug_rng)

        writer = TimingWriter()
        ckpt_times = {}
        last_t = [time.perf_counter()]
        measured = []

        def on_checkpoint(ckpt: prune_lib.PruneCheckpoint):
            ckpt_times[ckpt.percentage] = time.perf_counter() - last_t[0]
            # measure AFTER the loop (engines compile 480p programs; keep
            # the prune pipeline's own wall-clock clean of them)
            measured.append(ckpt)
            last_t[0] = time.perf_counter()

        t0 = time.perf_counter()
        prune_lib.prune_iteratively(
            model, model.arch, jax.tree.map(jnp.asarray, adapted),
            batches_fn, is_offline=False,
            prune_per_iter=args.prune_per_iter,
            n_epochs_select=args.n_epochs_select,
            n_epochs_finetune=args.n_epochs_finetune,
            percentage_max=args.percentage_max,
            checkpoint_fn=on_checkpoint, summary_writer=writer)
        prune_wall = time.perf_counter() - t0
        wall['prune_pipeline_s'] = round(prune_wall, 1)
        wall['prune_rank_epoch_s'] = round(
            writer.epoch_cost('train_pruning/loss'), 4)
        wall['prune_finetune_epoch_s'] = round(
            writer.epoch_cost('finetune/loss'), 4)
        wall['prune_s_per_checkpoint'] = {
            p: round(t, 1) for p, t in ckpt_times.items()}
        print(f'prune pipeline: {prune_wall:.0f} s total; rank epoch '
              f"{wall['prune_rank_epoch_s']:.3f} s, fine-tune epoch "
              f"{wall['prune_finetune_epoch_s']:.3f} s", flush=True)

        for ckpt in measured:
            small = OSVOSResNet(arch=ckpt.arch)
            name = f'prune{ckpt.percentage}'
            points[name] = measure_point(
                name, small, jax.tree.map(jnp.asarray, ckpt.variables),
                db_test, root, args.bench_runs)
            print(f'{name}: {points[name]}', flush=True)

    # --- 3. mimic students sde 0..6 ---------------------------------------
    if not args.skip_mimic:
        aug_rng2 = np.random.RandomState(1)
        teacher_vars = jax.tree.map(jnp.asarray, adapted)

        def train_batches():
            return transforms.augmented_frame_stream(db_train, aug_rng2)

        for sde in [int(s) for s in args.sdes.split(',')]:
            student_arch = resnet_arch(18, scale_down_exponent=sde)
            student = OSVOSResNet(arch=student_arch)
            svars = student.init(jax.random.PRNGKey(1),
                                 jnp.zeros((1, 64, 96, 3), jnp.float32),
                                 train=False)
            t0 = time.perf_counter()
            mres = mimic_lib.train_mimic(
                student, svars, model, teacher_vars, train_batches,
                n_epochs=args.mimic_epochs, criterion='CBCEL',
                learn_from='teacher')
            dt = time.perf_counter() - t0
            name = f'mimic_sde{sde}'
            points[name] = measure_point(
                name, student,
                {'params': mres.state.params,
                 'batch_stats': mres.state.batch_stats},
                db_test, root, args.bench_runs)
            points[name]['distill_s'] = round(dt, 1)
            print(f'{name}: {points[name]}', flush=True)

    wall['total_s'] = round(time.perf_counter() - t_all, 1)

    # --- 4. artifacts ------------------------------------------------------
    doc = {'config': {k: v for k, v in vars(args).items()
                      if k != 'render_only'},
           'wall_clock': wall, 'points': points}
    write_artifacts(doc, out)

    for k, p in points.items():
        print(json.dumps({'metric': f'curve_{k}_fps_b1', 'value': p['fps_b1'],
                          'unit': 'frames/s', 'j_mean': p['j_mean']}),
              flush=True)
    print(json.dumps({'metric': 'compression_curve_wall_s',
                      'value': wall['total_s'], 'unit': 's',
                      'detail': wall}), flush=True)
    print(f'wrote {out}/curve.json, curve.md, quality_vs_speed.png',
          flush=True)


if __name__ == '__main__':
    main()
