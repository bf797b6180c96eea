"""Model-zoo benchmark: DAVIS-2016 480p inference throughput on the TPU chip.

Reproduces the reference's measured speed table (the only published numbers,
``src/eval/visualizations.ipynb`` cell 3: vgg16 0.08083 s/frame, resnet18
0.01067, resnet34 0.01386 — cuda.synchronize-bracketed, 10 runs, first
discarded, ``experiment_helper.py:29-53``) across the whole zoo:

* vgg16 / resnet18 / resnet34 — serving throughput above the batch knee
  (b128/b64) in bf16 and int8 PTQ (compress/quantize.py), plus batch-1
  latency in fp32 (the reference's setup, so vs_baseline is like-for-like),
  bf16, and int8;
* a 50%-channel-pruned resnet18 (topology produced by the real
  ``compress.prune.materialize`` path, reference ``prune.py:297-481``);
* the mimic student at scale_down_exponent=3 (width/8, ``mimic.py:243-244``);
* the signature workload: a full-budget (10k-step) one-shot online
  adaptation, reference ``train_online.py:147-152``;
* offline parent-training throughput (device-resident engine, batched).

Prints ONE JSON line per config:
``{"metric", "value", "unit", "vs_baseline"}``.

Budget discipline (the driver kills long benches — r03 hit its timeout):
the HEADLINE config (resnet18 480p b128 int8 + folded BNs, the best
single-chip serving setup) is measured and printed FIRST so it survives a timeout, and its JSON
is re-emitted as the FINAL line so single-line consumers that read the last
line still get the headline. Slow secondary rows (duplicate precisions at
b64, the fp32 adaptation variant, batch-1 resident training) run only with
``--full``; the costliest default row (batched offline training) runs last.
"""
import argparse
import json
import sys
import time

import numpy as np

from fosvos_tpu.runtime.device import enable_compilation_cache

enable_compilation_cache()

# reference measurements (visualizations.ipynb cell 3), fps = 1/s_per_frame
BASELINE_FPS = {
    'vgg16': 1.0 / 0.08083,      # ~12.4
    'resnet18': 1.0 / 0.01067,   # ~93.7
    'resnet34': 1.0 / 0.01386,   # ~72.2
}


def _bf16(variables):
    import jax
    import jax.numpy as jnp
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)


def _build_resnet(version=18, scale_down_exponent=0):
    import jax
    import jax.numpy as jnp
    from fosvos_tpu.models import make_resnet
    model = make_resnet(version, scale_down_exponent=scale_down_exponent)
    # init at a tiny spatial size — conv params are H/W-independent and the
    # 480p init program would cost minutes of needless compile time
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 3), jnp.float32),
                           train=False)
    return model, variables


def _build_vgg():
    import jax
    import jax.numpy as jnp
    from fosvos_tpu.models import OSVOSVGG
    model = OSVOSVGG()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 3), jnp.float32),
                           train=False)
    return model, variables


def _build_pruned50():
    """resnet18 with 50% of the channels of every prunable conv removed,
    materialized through the real pruning path (exact topology a 50% prune
    run produces, including downsample fixups)."""
    from fosvos_tpu.compress import prune
    from fosvos_tpu.models import OSVOSResNet, resnet_arch

    arch = resnet_arch(18)
    model, variables = _build_resnet(18)
    masks = prune.init_masks(arch)
    for site, m in masks.items():
        m = np.asarray(m).copy()
        m[::2] = 0.0  # drop every other channel (keeps >= 4, prune.py:30)
        masks[site] = m
    new_arch, new_vars = prune.materialize(arch, variables, masks)
    return OSVOSResNet(arch=new_arch), new_vars


def _measure(model, variables, batch: int, dtype: str, n_runs: int,
             fold: bool = False) -> float:
    """fps via the pipelined in-order fence (runtime.timing semantics: TPU
    programs execute in order; enqueue n_runs forwards, fence once with a
    tiny readback — per-call block_until_ready would measure the tunnel).
    Matches the reference's 10-runs/skip-first protocol
    (experiment_helper.py:29-53); best-of-3 rounds against tunnel noise.

    ``dtype='int8'``: post-training-quantized convs (compress/quantize.py,
    int8 x int8 -> int32 on the MXU), calibrated on a 4-frame slice of the
    benchmark frames. Non-conv stages and inter-layer activations run in
    bfloat16 — f32 activations would double the HBM footprint of the bf16
    serving config (VGG b64 480p OOMs)."""
    import jax
    import jax.numpy as jnp
    from fosvos_tpu.compress import foldbn

    h, w = 480, 854
    rng = np.random.RandomState(0)
    jdt = jnp.bfloat16 if dtype in ('bf16', 'int8') else jnp.float32
    if fold:
        # BN folding (compress/foldbn.py): +2.6% bf16 / +3.9% int8
        # measured at this config; f32 fold before any precision cast
        variables = foldbn.fold(model, variables)
    if dtype in ('bf16', 'int8'):
        variables = _bf16(variables)
    # pin params in HBM: numpy leaves (e.g. from prune.materialize) would
    # otherwise be re-transferred over the host link on every call, which
    # measured 7x slower than the model itself behind this tunnel
    variables = jax.device_put(variables)

    frames_np = rng.randn(batch, h, w, 3).astype(np.float32) * 40.0

    if dtype == 'int8':
        from fosvos_tpu.compress import quantize
        qtree = jax.device_put(quantize.build_qparams(
            model, variables, [jnp.asarray(frames_np[:4], jdt)]).tree())

        @jax.jit
        def forward_q(variables, qtree, images):
            outs = foldbn.folded_apply(
                model, variables, images,
                apply_fn=lambda v, x, **kw: quantize.quantized_apply(
                    model, v, qtree, x, **kw))
            prob = jax.nn.sigmoid(outs[-1][..., 0].astype(jnp.float32))
            return jnp.round(prob * 255.0).astype(jnp.uint8)

        frames = jnp.asarray(frames_np, jdt)

        def call():
            return forward_q(variables, qtree, frames)
    else:
        @jax.jit
        def forward_masks(variables, images):
            outs = foldbn.folded_apply(model, variables, images,
                                       train=False)
            prob = jax.nn.sigmoid(outs[-1][..., 0].astype(jnp.float32))
            return jnp.round(prob * 255.0).astype(jnp.uint8)

        frames = jnp.asarray(frames_np, jdt)

        def call():
            return forward_masks(variables, frames)

    from fosvos_tpu.runtime.timing import time_pipelined
    np.asarray(call())  # compile (excluded from every timing round)
    # best-of-3 pipelined-fence rounds; the protocol is the ONE shared
    # implementation (runtime.timing.time_pipelined) so probe tools and
    # bench rows cannot drift (ADVICE r4)
    best_dt = min(time_pipelined(call, n_runs=n_runs) for _ in range(3))
    return batch / best_dt


def _bench_online_adaptation(dtype: str = 'fp32', network: str = 'resnet18'):
    """The signature workload: full-budget one-shot adaptation (10,000 steps,
    batch 1, flip + 3-scale augmentation, step every 5 — reference
    train_online.py:147-152) at 480p. ``network='resnet18'`` uses Adam
    variant 11; ``'vgg16'`` uses the reference's grouped-SGD preset with
    frozen score_dsn (network_provider.py:144-159).

    Baseline: the reference's loop runs 10,000 forward+backward GPU passes;
    at its own published forward speed (10.67 ms/frame resnet18 /
    80.83 ms/frame vgg16, visualizations.ipynb cell 3) the forwards ALONE
    bound its wall-clock, so that is used as a conservative lower bound for
    vs_baseline.

    tools/bench_online_adaptation.py is the interactive variant of this
    measurement (per-run prints, --sequential / --network / --dtype knobs);
    keep the workload definitions in sync.
    """
    import jax
    import jax.numpy as jnp
    from fosvos_tpu.models import OSVOSVGG
    from fosvos_tpu.train import online, optimizers

    if network == 'vgg16':
        model, variables = _build_vgg()
        preset = optimizers.vgg_online_preset()
    else:
        model, variables = _build_resnet(18)
        preset = optimizers.online_variant(11)
    if dtype == 'bf16':
        # --bf16 adaptation: bf16 activations, fp32 params/opt/loss
        # (cli.train_online.adaptation_model recipe)
        model = model.clone(dtype=jnp.bfloat16)
    variables = jax.device_put(variables)
    rng = np.random.RandomState(0)
    img = (rng.randn(480, 854, 3) * 40.0).astype(np.float32)
    gt = np.zeros((480, 854), np.float32)
    gt[100:300, 200:500] = 1.0

    tuner = online.OnlineFinetuner(model, preset, avg_grad_every_n=5)
    best = float('inf')
    for i in range(2):  # first run pays the per-scale scan compiles
        res = tuner.finetune(variables, img, gt, n_epochs=10000, seed=i)
        assert np.isfinite(res.losses).all()
        best = min(best, res.wall_time_s)
    return best


_RESIDENT_DS = {}


def _resident_bench_dataset(n_frames_total: int):
    """Synthetic 480p train split for the resident-training rows, memoized
    so the b32/b16 (and --full b1) rows share one generation + decode."""
    import tempfile
    from fosvos_tpu.data import davis, synthetic

    n_seqs = -(-n_frames_total // 8)
    if n_seqs not in _RESIDENT_DS:
        root = tempfile.mkdtemp(prefix='bench_resident_')
        synthetic.generate(root,
                           sequences=[f's{i}' for i in range(n_seqs)],
                           val_sequences=['v0'], n_frames=8,
                           size=(480, 854))
        _RESIDENT_DS[n_seqs] = davis.DAVIS2016(mode='train',
                                               db_root_dir=root)
    return _RESIDENT_DS[n_seqs]


def _bench_offline_resident_train(batch_size: int = 1, dtype: str = 'fp32'):
    """Offline parent-training throughput in device-resident mode
    (train/resident.py): HBM-resident uint8 split, on-device flip+3-scale
    augmentation, chunked scans. Steady-state epochs (first epoch pays the
    per-scale compiles / cache loads and is discarded).

    ``batch_size=1`` is the reference's setting (train_offline.py:155) and
    is latency/BN-serialization-bound on a TPU; batched rows (e.g. b16)
    show the throughput the same engine reaches when the user raises
    ``--batch-size`` (documented BN-semantics deviation: running stats see
    batch moments over 16 frames instead of 1 — the reference's batch-1
    BN is itself a known quirk, SURVEY.md §7 "hard parts").

    ``dtype='bf16'`` is the CLI's ``--bf16`` recipe (bf16 activations,
    fp32 params/BN-stats/losses, cli/train_offline.py:38-43). The r04
    "knee at b32, b64 flat at 502" was an artifact of the 4-steps/epoch
    fixture; on the amortizing fixture the same engine measures 593 (b32)
    -> 657 (b64) -> **928 fps (b128)** — the training path has the same
    b128 knee as serving (tools/profile_resident_step.py decomposition:
    the step is backward-bound and the backward keeps gaining MXU
    efficiency up to b128).

    Baseline note: the reference publishes no train-step time; its published
    *forward* speed (10.67 ms/frame) is a strict lower bound on its train
    step (fwd+bwd+step), so vs_baseline computed against 93.7 fps is a
    conservative LOWER bound on the true ratio.
    """
    import jax
    import jax.numpy as jnp
    from fosvos_tpu.models import make_resnet
    from fosvos_tpu.train import optimizers, resident

    # >= 12 steps/epoch at the largest batch: the per-epoch host round trip
    # (permutation out + ONE loss readback, ~60 ms behind this tunnel) must
    # be amortized like a real epoch does — at 4 steps/epoch it depressed
    # the measured rate ~11% (tools/profile_resident_step.py measured the
    # pure device schedule at 668 fps vs the 511 fps r04 row). Real DAVIS
    # epochs are 2079 frames, where the overhead is <1%.
    ds = _resident_bench_dataset(max(384, 12 * batch_size))
    model = make_resnet(18)
    if dtype == 'bf16':
        model = model.clone(dtype=jnp.bfloat16)
    variables = jax.device_put(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32),
        train=False))
    stats = []
    resident.train_offline_resident(
        model, variables, ds, preset=optimizers.offline_variant(11),
        n_epochs=4, batch_size=batch_size, avg_grad_every_n=10, augment=True,
        seed=0, snapshot_every_n=10 ** 9, log_fn=stats.append)
    steady = min(s.wall_time_s for s in stats[1:])
    return len(ds) / steady


# serving-row spatial size: tests/CPU smokes shrink this (prod = 480p)
_SH, _SW = 480, 854


def _bench_fleet_serving(streams: int) -> float:
    """Aggregate fleet throughput: S per-stream adapted models segmented by
    ONE compiled program per step (evaluation/fleet.py unrolled-scan design;
    tools/bench_fleet_serving.py is the interactive A/B variant). Frames are
    device-resident so the row measures dispatch+compute throughput, not the
    tunnel link (BENCHMARKS.md "Fleet serving")."""
    import jax
    import jax.numpy as jnp
    from fosvos_tpu.evaluation import fleet
    from fosvos_tpu.models import make_resnet
    from fosvos_tpu.runtime.timing import time_pipelined

    model = make_resnet(18)
    x0 = jnp.zeros((1, 64, 96, 3), jnp.float32)
    var_list = [model.init(jax.random.PRNGKey(k), x0, train=False)
                for k in range(streams)]
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, size=(streams, _SH, _SW, 3),
                         dtype=np.uint8)
    server = fleet.FleetServer(model, bf16=True)
    stacked = server.put_weights(var_list)
    server.segment(stacked, frames)  # compile + warm
    dframes = jax.device_put(jnp.asarray(frames))
    dt = min(time_pipelined(
        lambda: server._forward_fleet(stacked, dframes), n_runs=10)
        for _ in range(3))
    return streams / dt


def _bench_elastic(capacity: int = 8):
    """Elastic-fleet churn costs (evaluation/elastic.py):

    * steady-state join (one-slot scatter + single-stream upload), ms;
    * measured amortized padding overhead across occupancies 1..capacity
      vs exact-occupancy serving — the analytic expectation for uniform
      membership is ~1.33x (BENCHMARKS.md "Elastic membership").

    Per-occupancy serve time is measured on the underlying per-bucket
    program with device-resident padded frames (the production
    ``segment_async`` path minus the host frame upload, which behind this
    tunnel would measure the link)."""
    import time as _time
    import jax
    import jax.numpy as jnp
    from fosvos_tpu.evaluation import elastic
    from fosvos_tpu.models import make_resnet
    from fosvos_tpu.runtime.timing import time_pipelined

    model = make_resnet(18)
    x0 = jnp.zeros((1, 64, 96, 3), jnp.float32)
    ef = elastic.ElasticFleet(model, capacity=capacity, bf16=True)
    join_ms = []
    for k in range(capacity):
        v = model.init(jax.random.PRNGKey(k), x0, train=False)
        t0 = _time.perf_counter()
        ef.add(v)
        join_ms.append((_time.perf_counter() - t0) * 1e3)

    rng = np.random.RandomState(0)
    bucket_dt = {}   # bucket size -> per-step s (device-resident frames)
    per_occ = []
    for n in range(1, capacity + 1):
        # temporarily truncate membership to n active slots
        full = ef._active
        ef._active = full[:n]
        ef._cache_idx = None
        try:
            _, idx = ef._serve_indices()
            bucket = idx.shape[0]
            if bucket not in bucket_dt:
                gathered = ef._gather(ef._slots, jnp.asarray(idx))
                dframes = jax.device_put(jnp.asarray(rng.randint(
                    0, 256, size=(bucket, _SH, _SW, 3), dtype=np.uint8)))
                fwd = ef._server._forward_fleet
                np.asarray(fwd(gathered, dframes)[0, 0, :8])  # compile
                bucket_dt[bucket] = min(
                    time_pipelined(lambda: fwd(gathered, dframes),
                                   n_runs=5) for _ in range(3))
            per_occ.append((n, bucket_dt[bucket]))
        finally:
            ef._active = full
            ef._cache_idx = None
    ideal_per_frame = bucket_dt[max(bucket_dt)] / capacity
    measured = sum(dt for _, dt in per_occ)
    ideal = sum(n * ideal_per_frame for n, _ in per_occ)
    overhead_x = measured / ideal
    return min(join_ms[1:]), overhead_x, per_occ


def _bench_service_join(capacity: int = 4, n_epochs: int = 10000):
    """Steady-state stream-join latency of the production VOSService: full
    one-shot adaptation (reference budget) + slot install + first serving
    dispatch — "a new camera is live in X seconds". The first joins pay the
    per-bucket serve compiles; the row reports the last join at full
    occupancy (all programs cached). tools/bench_service.py is the
    interactive variant."""
    import time as _time
    import jax
    import jax.numpy as jnp
    from fosvos_tpu.evaluation.service import VOSService
    from fosvos_tpu.models import make_resnet

    model = make_resnet(18)
    parent = jax.device_put(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32),
        train=False))
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, size=(capacity, _SH, _SW, 3),
                         dtype=np.uint8)
    mask = np.zeros((_SH, _SW), np.uint8)
    mask[_SH // 4:_SH // 2, _SW // 4:_SW // 2] = 255
    svc = VOSService(model, parent, capacity=capacity, n_epochs=n_epochs,
                     bf16=True, adapt_bf16=True)
    join_s = []
    for k in range(capacity):
        t0 = _time.perf_counter()
        svc.join(frames[k], mask, seed=k)
        svc.segment(frames[:k + 1])
        join_s.append(_time.perf_counter() - t0)
    return join_s[-1]


def _bench_mimic_resident(batch_size: int = 1):
    """Mimic distillation throughput in device-resident mode
    (compress/mimic.py train_mimic_resident): teacher forward + student
    fwd/bwd + Adam per step, full flip+3-scale device augmentation,
    steady-state epochs over an HBM-resident split (BENCHMARKS.md
    "Compression pipelines"). ``batch_size=1`` is the reference's
    setting; ``batch_size>1`` is the batched sweep (same BN-moments
    deviation and b128 knee as the parent trainer)."""
    import tempfile
    import time as _time
    import jax
    import jax.numpy as jnp
    from fosvos_tpu.compress import mimic
    from fosvos_tpu.data import davis, synthetic
    from fosvos_tpu.models import make_resnet

    n_seqs = max(4, (12 * batch_size) // 8)
    root = tempfile.mkdtemp(prefix='bench_mimic_')
    synthetic.generate(root, sequences=[f's{i}' for i in range(n_seqs)],
                       val_sequences=['v0'], n_frames=8 if batch_size > 1
                       else 4, size=(_SH, _SW))
    ds = davis.DAVIS2016(mode='train', db_root_dir=root)
    teacher = make_resnet(18)
    student = make_resnet(18, scale_down_exponent=3)
    x0 = jnp.zeros((1, 64, 96, 3), jnp.float32)
    tvars = jax.device_put(teacher.init(jax.random.PRNGKey(0), x0,
                                        train=False))
    svars = jax.device_put(student.init(jax.random.PRNGKey(1), x0,
                                        train=False))

    class _W:  # epoch fence timestamps via the scalar-tag stream
        def __init__(self):
            self.t = []

        def add_scalar(self, tag, value, step):
            if tag == 'total_loss_epoch':
                self.t.append(_time.perf_counter())

        def close(self):
            pass

    w = _W()
    t0 = _time.perf_counter()
    mimic.train_mimic_resident(student, svars, teacher, tvars, ds,
                               n_epochs=4, summary_writer=w, seed=0,
                               batch_size=batch_size)
    walls = np.diff([t0] + w.t)
    steady = walls[1:].min()  # first epoch pays the per-scale compiles
    return len(ds) / steady


def _bench_qat_overhead(n_epochs: int = 10000):
    """QAT adaptation overhead vs the float adaptation at the same budget
    (compress/qat.py fake-quant forward; tools/bench_qat_adaptation.py is
    the interactive variant with the serving-quality legs — the J&F delta
    itself is pinned by tests/test_qat.py)."""
    import jax
    import jax.numpy as jnp
    from fosvos_tpu.compress import qat
    from fosvos_tpu.models import make_resnet
    from fosvos_tpu.train import online, optimizers

    model, variables = _build_resnet(18)
    variables = jax.device_put(variables)
    rng = np.random.RandomState(0)
    img = (rng.randn(_SH, _SW, 3) * 40.0).astype(np.float32)
    gt = np.zeros((_SH, _SW), np.float32)
    gt[_SH // 4:_SH // 2, _SW // 4:_SW // 2] = 1.0
    preset = optimizers.online_variant(11)

    float_s = float('inf')
    tuner = online.OnlineFinetuner(model, preset, avg_grad_every_n=5)
    for i in range(2):
        float_s = min(float_s, tuner.finetune(
            variables, img, gt, n_epochs=n_epochs, seed=i).wall_time_s)

    scales = qat.calibrate_scales(model, variables, [img[None]],
                                  margin=1.25)
    qtuner = online.OnlineFinetuner(model, preset, avg_grad_every_n=5,
                                    apply_fn=qat.make_apply(model, scales))
    qat_s = float('inf')
    for i in range(2):
        qat_s = min(qat_s, qtuner.finetune(
            variables, img, gt, n_epochs=n_epochs, seed=i).wall_time_s)
    return qat_s, float_s


def _run_serving_rows():
    """--serving: the serving/production rows of BENCHMARKS.md, one
    standard JSON line each (VERDICT r4 #3: every table row maps 1:1 to a
    checked-in metric emitter)."""
    for s in (8, 16):
        t0 = time.perf_counter()
        agg = _bench_fleet_serving(s)
        print(f'# fleet s{s}: {agg:.1f} fps aggregate '
              f'({time.perf_counter() - t0:.0f}s incl. compile)',
              file=sys.stderr)
        _emit({'metric': f'fleet_serving_aggregate_fps_s{s}',
               'value': round(agg, 2), 'unit': 'frames/s/chip',
               # vs one reference GPU process serving one stream
               'vs_baseline': round(agg / BASELINE_FPS['resnet18'], 2)})

    t0 = time.perf_counter()
    join_ms, overhead_x, per_occ = _bench_elastic(8)
    print(f'# elastic: join {join_ms:.0f} ms, padding overhead '
          f'{overhead_x:.3f}x (per-occupancy {per_occ}) '
          f'({time.perf_counter() - t0:.0f}s incl. compile)',
          file=sys.stderr)
    _emit({'metric': 'elastic_fleet_join_ms', 'value': round(join_ms, 1),
           'unit': 'ms',
           # vs re-uploading the whole 8-stream fleet (the naive join)
           'vs_baseline': 8.0})
    _emit({'metric': 'elastic_fleet_padding_overhead_x',
           'value': round(overhead_x, 3), 'unit': 'x',
           # the analytic expectation for uniform membership sizes
           'vs_baseline': 1.33})

    t0 = time.perf_counter()
    join_s = _bench_service_join(4)
    print(f'# service join (steady): {join_s:.1f} s '
          f'({time.perf_counter() - t0:.0f}s total)', file=sys.stderr)
    _emit({'metric': 'service_join_wall_s', 'value': round(join_s, 2),
           'unit': 's',
           # reference chain lower bound: 10k GPU forwards + process spawn
           'vs_baseline': round(10000 * 0.01067 / join_s, 2)})

    t0 = time.perf_counter()
    vgg_s = _bench_online_adaptation('fp32', network='vgg16')
    print(f'# vgg16 online adaptation: {vgg_s:.1f} s '
          f'({time.perf_counter() - t0:.0f}s incl. compile)',
          file=sys.stderr)
    _emit({'metric': 'vgg16_online_adaptation_10k_steps_wall_s',
           'value': round(vgg_s, 2), 'unit': 's',
           'vs_baseline': round(10000 * 0.08083 / vgg_s, 2)})

    for b in (1, 64):
        t0 = time.perf_counter()
        mimic_fps = _bench_mimic_resident(b)
        print(f'# mimic resident distill b{b}: {mimic_fps:.1f} frames/s '
              f'({time.perf_counter() - t0:.0f}s incl. compile)',
              file=sys.stderr)
        suffix = '' if b == 1 else f'_b{b}'
        _emit({'metric': f'mimic_distill_fps_resident{suffix}',
               'value': round(mimic_fps, 2), 'unit': 'frames/s/chip',
               # reference fwd-only bound, as for the offline train rows
               'vs_baseline': round(mimic_fps / BASELINE_FPS['resnet18'],
                                    2)})

    t0 = time.perf_counter()
    qat_s, float_s = _bench_qat_overhead()
    print(f'# qat adaptation: {qat_s:.1f} s vs float {float_s:.1f} s '
          f'({time.perf_counter() - t0:.0f}s total)', file=sys.stderr)
    _emit({'metric': 'qat_adaptation_10k_steps_wall_s',
           'value': round(qat_s, 2), 'unit': 's',
           'vs_baseline': round(10000 * 0.01067 / qat_s, 2)})
    _emit({'metric': 'qat_adaptation_overhead_x',
           'value': round(qat_s / float_s, 3), 'unit': 'x',
           'vs_baseline': 1.0})


def _emit(row):
    print(json.dumps(row), flush=True)
    return row


def _run_zoo_row(metric, build, batch, dtype, base_key, n_runs,
                 fold=False):
    t0 = time.perf_counter()
    model, variables = build()
    fps = _measure(model, variables, batch, dtype, n_runs, fold=fold)
    print(f'# {metric}: {fps:.1f} fps '
          f'({time.perf_counter() - t0:.0f}s incl. compile)',
          file=sys.stderr)
    return _emit({
        'metric': metric,
        'value': round(fps, 2),
        'unit': 'frames/s/chip',
        'vs_baseline': round(fps / BASELINE_FPS[base_key], 2),
    })


def _run_adaptation_row(dtype):
    t0 = time.perf_counter()
    adapt_s = _bench_online_adaptation(dtype)
    print(f'# online adaptation {dtype}: {adapt_s:.1f} s '
          f'({time.perf_counter() - t0:.0f}s incl. compile)',
          file=sys.stderr)
    suffix = '' if dtype == 'fp32' else f'_{dtype}'
    return _emit({
        'metric': f'resnet18_online_adaptation_10k_steps_wall_s{suffix}',
        'value': round(adapt_s, 2),
        'unit': 's',
        # reference lower bound: 10k forwards at its published 10.67 ms/frame
        'vs_baseline': round(10000 * 0.01067 / adapt_s, 2),
    })


def _run_offline_train_row(batch_size, dtype='fp32'):
    t0 = time.perf_counter()
    train_fps = _bench_offline_resident_train(batch_size, dtype)
    suffix = '' if batch_size == 1 else f'_b{batch_size}'
    if dtype != 'fp32':
        suffix += f'_{dtype}'
    print(f'# offline resident train b{batch_size} {dtype}: '
          f'{train_fps:.1f} frames/s '
          f'({time.perf_counter() - t0:.0f}s incl. compile)',
          file=sys.stderr)
    return _emit({
        'metric': f'resnet18_480p_offline_train_fps_resident{suffix}',
        'value': round(train_fps, 2),
        'unit': 'frames/s/chip',
        # conservative lower bound: reference fwd-only speed (93.7 fps) is
        # faster than its unmeasured train step
        'vs_baseline': round(train_fps / BASELINE_FPS['resnet18'], 2),
    })


# (metric name, builder, batch, dtype, baseline key, n_runs) — ordered by
# importance: the headline is FIRST (survives a driver timeout), then the
# batch-1 latency axis (incl. the reference's fp32 setup for like-for-like
# vs_baseline), then the serving zoo above the batch knee, then the
# compressed models.
ZOO_DEFAULT = [
    # headline: best single-chip serving config — int8 PTQ + folded BNs
    # above the batch knee (compress/foldbn.py measured +3.9% over
    # unfolded int8)
    ('resnet18_480p_throughput_fps_b128_int8_foldbn',
     lambda: _build_resnet(18), 128, 'int8', 'resnet18', 10, True),
    ('resnet18_480p_throughput_fps_b128_int8', lambda: _build_resnet(18),
     128, 'int8', 'resnet18', 10),
    ('resnet18_480p_throughput_fps_b128_foldbn',
     lambda: _build_resnet(18), 128, 'bf16', 'resnet18', 10, True),
    ('resnet18_480p_throughput_fps_b128', lambda: _build_resnet(18),
     128, 'bf16', 'resnet18', 10),
    # batch-1 latency: fp32 = like-for-like with the reference protocol;
    # int8 = the HBM-bandwidth lever (weights 4x smaller than fp32)
    ('resnet18_480p_latency_fps_b1_fp32', lambda: _build_resnet(18),
     1, 'fp32', 'resnet18', 30),
    # b1 bf16 + folded BNs: +2.3% over unfolded bf16 in a paired session
    # (tools/bench_b1_fold_probe.py) and within ~2% session noise of b1
    # fp32 across sessions — tied-best, not a clear winner; int8+fold at
    # b1 is a 2x REGRESSION: the dequant stops fusing into the conv
    # epilogue and 93 MB of raw s32 conv outputs materialize per frame,
    # probe --hlo)
    ('resnet18_480p_latency_fps_b1_bf16_foldbn', lambda: _build_resnet(18),
     1, 'bf16', 'resnet18', 30, True),
    ('resnet18_480p_latency_fps_b1_bf16', lambda: _build_resnet(18),
     1, 'bf16', 'resnet18', 30),
    ('resnet18_480p_latency_fps_b1_int8', lambda: _build_resnet(18),
     1, 'int8', 'resnet18', 30),
    ('vgg16_480p_latency_fps_b1_fp32', _build_vgg, 1, 'fp32', 'vgg16', 10),
    ('vgg16_480p_latency_fps_b1_int8', _build_vgg, 1, 'int8', 'vgg16', 10),
    # serving batches above the b64 knee (measured: resnet18 ~3300 fps at
    # b128 vs ~2000 at b64; vgg16 +27% at b128)
    ('vgg16_480p_throughput_fps_b128', _build_vgg, 128, 'bf16', 'vgg16', 5),
    ('vgg16_480p_throughput_fps_b128_int8', _build_vgg, 128, 'int8',
     'vgg16', 5),
    ('resnet34_480p_throughput_fps_b64', lambda: _build_resnet(34),
     64, 'bf16', 'resnet34', 10),
    ('resnet18_pruned50_480p_throughput_fps_b64', _build_pruned50,
     64, 'bf16', 'resnet18', 10),
    ('resnet18_mimic_sde3_480p_throughput_fps_b64',
     lambda: _build_resnet(18, scale_down_exponent=3), 64, 'bf16',
     'resnet18', 10),
]

# secondary rows (duplicate precisions / batch sizes): --full only
ZOO_FULL_EXTRA = [
    ('vgg16_480p_latency_fps_b1_bf16', _build_vgg, 1, 'bf16', 'vgg16', 10),
    ('vgg16_480p_throughput_fps_b64', _build_vgg, 64, 'bf16', 'vgg16', 5),
    ('vgg16_480p_throughput_fps_b64_int8', _build_vgg, 64, 'int8',
     'vgg16', 5),
    ('resnet18_480p_throughput_fps_b64', lambda: _build_resnet(18),
     64, 'bf16', 'resnet18', 20),
    ('resnet18_480p_throughput_fps_b64_int8', lambda: _build_resnet(18),
     64, 'int8', 'resnet18', 10),
]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--full', action='store_true',
                    help='also run the secondary rows (duplicate precisions '
                         'at b64, fp32 adaptation, batch-1 resident train)')
    ap.add_argument('--serving', action='store_true',
                    help='run ONLY the serving/production rows (fleet '
                         'aggregate fps, elastic join + padding overhead, '
                         'service join latency, vgg adaptation, resident '
                         'mimic rate, QAT overhead) — the BENCHMARKS.md '
                         'rows outside the default zoo; budget ~45-50 min '
                         'warm-cache (measured r05), hours cold')
    args = ap.parse_args(argv)

    if args.serving:
        _run_serving_rows()
        return

    headline = _run_zoo_row(*ZOO_DEFAULT[0])
    for cfg in ZOO_DEFAULT[1:]:
        _run_zoo_row(*cfg)
    if args.full:
        for cfg in ZOO_FULL_EXTRA:
            _run_zoo_row(*cfg)

    _run_adaptation_row('bf16')
    if args.full:
        _run_adaptation_row('fp32')

    # the costliest rows run LAST so a driver timeout cannot eat the zoo
    _run_offline_train_row(128, 'bf16')  # best measured config (928 fps)
    _run_offline_train_row(16)           # fp32, like-for-like precision
    if args.full:
        _run_offline_train_row(64, 'bf16')
        _run_offline_train_row(32, 'bf16')
        _run_offline_train_row(1)

    # re-emit the headline as the final line for single-line consumers
    _emit(headline)


if __name__ == '__main__':
    main()
