import time, numpy as np, jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu'
from lipreading_tpu.config import PreprocessConfig
from lipreading_tpu.fixtures import make_clip
from lipreading_tpu.ops.detector import params_to_jax
from lipreading_tpu.ops.ert import model_to_jax
from lipreading_tpu.ops.preprocess import preprocess_clips
from lipreading_tpu.preproc_training import load_assets, load_release_model
from lipreading_tpu.infer import transcribe
det_np, ert_np = load_assets()
det, ert = params_to_jax(det_np), model_to_jax(ert_np)
pre_cfg = PreprocessConfig()
fparams, fcfg = load_release_model('transformer_hybrid')
clips = [make_clip(100+i) for i in range(80)]
frames = np.concatenate([c.frames for c in clips])
Tc = 64
for B in (32,):
    stack = jnp.asarray(frames[:B*Tc].reshape(B, Tc, *frames.shape[1:]))
    lengths = jnp.full((B,), Tc, jnp.int32)
    rois = preprocess_clips(det, ert, stack, pre_cfg)
    f = lambda: transcribe(fparams, fcfg, rois, lengths, beam=8, lm_weight=0.4)
    f()
    t0 = time.perf_counter(); reps = 5
    for _ in range(reps): out = f()
    dt = time.perf_counter() - t0
    print(f'flagship B={B}: {B*Tc*reps/dt:.1f} frames/s  ({dt/reps*1e3:.0f} ms/batch)', flush=True)

# train-step sweep on the flagship train config
from lipreading_tpu.train.loop import Trainer
from lipreading_tpu.config import preset
from lipreading_tpu.flops import train_step_flops, device_peak_flops
import tempfile, os
cfg = preset('transformer-attn')
peak = device_peak_flops(cfg.model.dtype)
for B in (8, 16, 32, 64):
    with tempfile.TemporaryDirectory() as d:
        tr = Trainer(cfg, d)
        T = 64
        rng = np.random.default_rng(0)
        from lipreading_tpu.data.dataset import Batch
        batch = Batch(
            rois_u8=rng.integers(0, 255, (B, T, 96, 96)).astype(np.uint8),
            frame_lengths=np.full((B,), T, np.int32),
            targets=np.pad(rng.integers(3, 30, (B, 20)).astype(np.int32), ((0,0),(0,20))),
            target_lengths=np.full((B,), 20, np.int32),
            ctc_labels=np.pad(rng.integers(3, 30, (B, 18)).astype(np.int32), ((0,0),(0,22))),
            ctc_lengths=np.full((B,), 18, np.int32),
            texts=['x']*B,
        )
        tr.train_step(batch)  # compile
        t0 = time.perf_counter(); reps = 10
        for _ in range(reps): m = tr.train_step(batch)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / reps
        fl = train_step_flops(cfg, B, T, 20)
        print(f'train B={B} T={T}: {B*T/dt:.0f} frames/s  {fl/dt/1e12:.2f} TFLOP/s  MFU {fl/dt/peak*100:.2f}%', flush=True)
