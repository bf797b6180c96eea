"""Elastic-fleet soak: hundreds of churn cycles with mixed PTQ/QAT streams.

The production serving story (the scale the reference gestures at with one
``run_webcam.py`` process per stream, ``src/run_webcam.py:65-78``) lives or
dies on churn: streams join, leave, re-adapt, and serve continuously for
hours. This soak interleaves hundreds of membership operations on one
:class:`~fosvos_tpu.evaluation.elastic.ElasticFleet` and asserts the three
properties a long-lived server needs:

* **bounded compilation** — at most one program per power-of-two serve
  bucket over the whole run (``<= log2(capacity) + 1``), never one per
  membership state;
* **no slot / HBM leak** — slot accounting is exact after every operation
  and the process's live device-buffer count stays flat from mid-soak to
  the end;
* **per-stream mask continuity** — every active stream's mask is
  bit-identical to its first-ever served mask across every intervening
  join/leave/swap and bucket change (weights and qparams only change when
  the stream itself is swapped).

Streams are mixed int8 provenance: PTQ (per-slot calibration frame) and
QAT (pre-built ``compress.qat.finalize`` scales) — both slot types must
survive each other's churn.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fosvos_tpu.data import davis, synthetic
from fosvos_tpu.evaluation import elastic
from fosvos_tpu.models import OSVOSResNet, resnet_arch


@pytest.fixture(scope='module')
def db(tmp_path_factory):
    return synthetic.generate(str(tmp_path_factory.mktemp('davis')),
                              size=(32, 48))


CAPACITY = 8
N_CYCLES = 250


def test_elastic_soak_mixed_ptq_qat_churn(db):
    from fosvos_tpu.compress import qat

    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x0 = jnp.zeros((1, 32, 48, 3), jnp.float32)
    ds = davis.DAVIS2016(mode='test', db_root_dir=db, seq_name='synth-swan')
    frames, _, _ = ds.load_sequence(raw=True)          # 4 uint8 frames

    # a pool of distinct weight sets; each joining stream picks one and a
    # fixed frame, so its served mask is a pure function of (weights, mode)
    rng = np.random.RandomState(0)
    pool = [jax.tree.map(jnp.asarray,
                         model.init(jax.random.PRNGKey(k), x0, train=False))
            for k in range(6)]
    qat_qparams = []
    for k, v in enumerate(pool):
        scales = qat.calibrate_scales(
            model, v,
            [frames[k % len(frames)][None].astype(np.float32)
             - np.asarray(ds.meanval, np.float32)])
        qat_qparams.append(qat.finalize(v, scales))

    ef = elastic.ElasticFleet(model, capacity=CAPACITY, int8=True,
                              mean=ds.meanval)

    # slot -> (frame index, first-served mask or None until served)
    live = {}
    uid = 0

    def join():
        nonlocal uid
        k = uid % len(pool)
        mode = 'qat' if uid % 3 == 0 else 'ptq'
        if mode == 'qat':
            slot = ef.add(pool[k], qparams=qat_qparams[k])
        else:
            slot = ef.add(pool[k], calib_frame=frames[k % len(frames)])
        live[slot] = [uid % len(frames), None]
        uid += 1

    def swap(slot):
        nonlocal uid
        k = uid % len(pool)
        if uid % 3 == 0:
            ef.swap_weights(slot, pool[k], qparams=qat_qparams[k])
        else:
            ef.swap_weights(slot, pool[k],
                            calib_frame=frames[k % len(frames)])
        live[slot] = [uid % len(frames), None]      # new identity
        uid += 1

    def segment():
        order = ef.active_slots
        batch = np.stack([frames[live[s][0]] for s in order])
        masks = ef.segment(batch)
        assert masks.shape[0] == len(order)
        for i, s in enumerate(order):
            if live[s][1] is None:
                live[s][1] = np.asarray(masks[i]).copy()
            else:                                   # continuity across churn
                np.testing.assert_array_equal(
                    masks[i], live[s][1],
                    err_msg=f'slot {s} mask drifted (cycle churn)')

    join()
    segment()
    n_live_mid = None
    ops = rng.randint(0, 100, size=N_CYCLES)
    for c, op in enumerate(ops):
        n = len(ef.active_slots)
        if op < 30 and ef.free_slots:               # join
            join()
        elif op < 45 and n > 1:                     # leave
            s = ef.active_slots[int(rng.randint(n))]
            ef.remove(s)
            del live[s]
        elif op < 60 and n:                         # re-adapt in place
            swap(ef.active_slots[int(rng.randint(n))])
        else:                                       # serve
            segment()
        # slot accounting is exact after EVERY operation
        assert len(ef.active_slots) + ef.free_slots == CAPACITY
        assert sorted(live) == sorted(ef.active_slots)
        if c == N_CYCLES // 2:
            segment()                               # populate serve cache
            n_live_mid = len(jax.live_arrays())
    segment()

    # bounded compilation: one program per bucket {1,2,4,8} at most
    assert ef._server._forward_fleet_q._cache_size() <= 4

    # no HBM leak: steady-state live buffers stay flat over the second half
    # of the soak (slack for the last op's transient gather/result arrays)
    n_live_end = len(jax.live_arrays())
    assert n_live_end <= n_live_mid + 50, (n_live_mid, n_live_end)
