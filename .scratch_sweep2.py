import time, tempfile, numpy as np, jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu'
from lipreading_tpu.config import PreprocessConfig, preset
from lipreading_tpu.fixtures import make_clip
from lipreading_tpu.ops.detector import params_to_jax
from lipreading_tpu.ops.ert import model_to_jax
from lipreading_tpu.ops.landmarker import params_to_jax as lmk_to_jax
from lipreading_tpu.ops.preprocess import preprocess_frames
from lipreading_tpu.preproc_training import load_assets, load_landmarker
from lipreading_tpu.flops import train_step_flops, device_peak_flops, mfu, preprocess_flops

det_np, ert_np = load_assets()
det, ert = params_to_jax(det_np), model_to_jax(ert_np)
lmj = lmk_to_jax(load_landmarker())
pre_cfg = PreprocessConfig()
conv_cfg = PreprocessConfig(landmarker="conv")
clips = [make_clip(100+i) for i in range(40)]
frames = np.concatenate([c.frames for c in clips])
for n in (512, 2048):
    fr = jnp.asarray(frames[:n])
    for name, model, cfg in (("ert", ert, pre_cfg), ("conv", lmj, conv_cfg)):
        f = jax.jit(lambda x, m=model, c=cfg: preprocess_frames(det, m, x, c))
        f(fr).block_until_ready()
        t0 = time.perf_counter(); reps = 10
        for _ in range(reps): out = f(fr)
        out.block_until_ready()
        fps = n*reps/(time.perf_counter()-t0)
        print(f'preprocess[{name}] n={n}: {fps:.0f} frames/s  MFU {mfu(preprocess_flops(cfg,160,160)*fps,"float32")*100:.2f}%', flush=True)

from lipreading_tpu.train.loop import Trainer
from lipreading_tpu.data.dataset import Batch, batch_to_device
cfg = preset('transformer-attn')
peak = device_peak_flops(cfg.model.dtype)
rng0 = np.random.default_rng(0)
for B in (8, 16, 32, 64):
    with tempfile.TemporaryDirectory() as d:
        tr = Trainer(cfg, d)
        T = 64
        batch = Batch(
            rois_u8=rng0.integers(0, 255, (B, T, 96, 96)).astype(np.uint8),
            frame_lengths=np.full((B,), T, np.int32),
            targets=np.pad(rng0.integers(3, 30, (B, 20)).astype(np.int32), ((0,0),(0,20))),
            target_lengths=np.full((B,), 20, np.int32),
            ctc_labels=np.pad(rng0.integers(3, 30, (B, 18)).astype(np.int32), ((0,0),(0,22))),
            ctc_lengths=np.full((B,), 18, np.int32),
            texts=['x']*B,
        )
        dev = batch_to_device(batch, cfg.preprocess.normalize_mean, cfg.preprocess.normalize_std)
        dev = jax.tree.map(lambda x: jax.device_put(x), dev)
        rkey = jax.random.PRNGKey(1)
        params, opt = tr.params, tr.opt_state
        params, opt, m = tr._jit_step(params, opt, dev, rkey)   # compile
        jax.block_until_ready(m)
        t0 = time.perf_counter(); reps = 20
        for _ in range(reps):
            params, opt, m = tr._jit_step(params, opt, dev, rkey)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / reps
        fl = train_step_flops(cfg, B, T, 20)
        print(f'train(dev-resident) B={B} T={T}: {B*T/dt:.0f} frames/s  {fl/dt/1e12:.2f} TFLOP/s  MFU {fl/dt/peak*100:.2f}%', flush=True)
