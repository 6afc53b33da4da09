"""Benchmark: DCASE2023-style 60 s SELD scene rendering throughput on one chip.

Measures the full production pipeline in steady state (after compile), generating
scenes in device batches — the shape a real dataset run uses:
  1. host: sample mic + event layouts (4 static + 1 moving event with a 9-point
     trajectory per scene — the DCASE2023 SELD generator's scene shape)
  2. device: ray-trace RIRs for every source of every scene in the batch in one
     wavefront (B x 13 sources, AmbeoVR 4-capsule receiver, 4 frequency bands)
  3. host: load dry event audio from WAV files, build compiled render plans
  4. device: render all B complete 60 s 4-channel scene mixes (vmapped program)
     and quantise to 16-bit on device (DCASE datasets ship 16/24-bit WAVs)
  5. host: drain the batch (device->host), DCASE metadata CSVs, PCM writes

Audio format follows the reference's DCASE2023 SELD dataset: 60 s scenes at
24 kHz (reference scripts/seld/generate_dataset.py:7-13).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}: value is
scene-seconds rendered per wall-clock second per chip; baseline target is 100x
real time (BASELINE.json north star).
"""

import json
import tempfile
import time
from pathlib import Path

import numpy as np

BATCH = 8
N_WARMUP_BATCHES = 1
N_MEASURE_BATCHES = 3
SCENE_SECONDS = 60.0
SR = 24000  # DCASE2023 SELD dataset sample rate
N_STATIC = 4
N_TRAJ = 9
EVENT_SECONDS = 5.0
IR_SECONDS = 0.5
N_RAYS = 5000
MAX_DEPTH = 60
ROOM = np.array([7.0, 5.0, 3.0])


def make_audio_pool(pool_dir: Path, n_files: int = 8):
    """Synthesised dry event WAVs (tones + noise bursts), EVENT_SECONDS each."""
    from audiblelight_tpu.io.audio import wav_write

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n_files):
        t = np.arange(int(EVENT_SECONDS * SR)) / SR
        freq = 200.0 * (i + 1)
        sig = 0.5 * np.sin(2 * np.pi * freq * t) * np.exp(-t * 0.4)
        sig += 0.05 * rng.standard_normal(len(t))
        p = pool_dir / f"event_{i}.wav"
        wav_write(p, sig.astype(np.float32), SR)
        paths.append(p)
    return paths


def sample_layout(rng):
    """Static positions + moving trajectory inside the room (mic at centre)."""
    margin = 0.5
    statics = np.stack([rng.uniform(margin, ROOM - margin) for _ in range(N_STATIC)])
    start, end = rng.uniform(margin, ROOM - margin), rng.uniform(margin, ROOM - margin)
    traj = np.linspace(start, end, N_TRAJ)
    return statics, traj


def main():
    import os

    import jax

    # Persistent compilation cache: keeps driver/bench warmup to seconds when
    # the programs were already compiled in any earlier process.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        pass
    import jax.numpy as jnp

    from audiblelight_tpu import config
    from audiblelight_tpu.geometry import box_mesh
    from audiblelight_tpu.io.audio import load_audio
    from audiblelight_tpu.micarrays import AmbeoVR
    from audiblelight_tpu.ops.convolve import interpolation_matrix
    from audiblelight_tpu.ops.stft import n_stft_frames
    from audiblelight_tpu.render import render_scene_arrays
    from audiblelight_tpu.rir.materials import get_material_absorption, octave_band_centers
    from audiblelight_tpu.rir.raytracer import trace_rirs_multi

    tmp = Path(tempfile.mkdtemp(prefix="al_bench_"))
    pool = make_audio_pool(tmp)
    pool_audio = [load_audio(p, sr=SR, mono=True)[0] for p in pool]

    mesh = box_mesh(extents=ROOM, center=ROOM / 2)
    tris = jnp.asarray(mesh.triangles.astype(np.float32))
    bands = octave_band_centers(config.RAY_TRACER_FREQUENCY_BANDS)
    alpha = get_material_absorption("Default", bands)
    absorption = jnp.broadcast_to(
        jnp.asarray(alpha, dtype=jnp.float32), (len(mesh.faces), len(bands))
    )
    scattering = jnp.full(len(mesh.faces), 0.5, dtype=jnp.float32)

    ir_len = int(IR_SECONDS * SR)
    s_pad = int(EVENT_SECONDS * SR)
    t_total = int(SCENE_SECONDS * SR)
    fr = n_stft_frames(s_pad)
    n_src = N_STATIC + N_TRAJ

    mic_center = np.array([ROOM[0] / 2, ROOM[1] / 2, 1.5])
    caps = jnp.asarray(AmbeoVR().set_absolute_coordinates(mic_center), dtype=jnp.float32)
    w_interp = interpolation_matrix(
        np.linspace(0, EVENT_SECONDS, N_TRAJ), SR, config.HOP_SIZE, fr
    ).astype(np.float32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def render_one_i16(irs, sa, ssnr, sstart, ma, msnr, mstart, w):
        """Render ONE scene and quantise to int16 (compiled once, reused B times;
        a B-way vmap of this program compiles for tens of minutes, so the batch
        dimension stays at the dispatch level and outputs are stacked on device)."""
        out = render_scene_arrays(
            sa,
            jnp.moveaxis(irs[:, :N_STATIC, :], 1, 0),
            jnp.ones(N_STATIC, dtype=jnp.float32),
            ssnr,
            sstart,
            jnp.full(N_STATIC, s_pad, dtype=jnp.int32),
            jnp.full(N_STATIC, s_pad, dtype=jnp.int32),
            ma,
            irs[:, N_STATIC:, :][None],
            w[None],
            jnp.ones(1, dtype=jnp.float32),
            msnr,
            mstart,
            jnp.full(1, s_pad, dtype=jnp.int32),
            jnp.full(1, s_pad, dtype=jnp.int32),
            jnp.zeros((4, t_total), dtype=jnp.float32),
            jnp.asarray(-65.0, dtype=jnp.float32),
            n_scene_samples=t_total,
        )
        peak = jnp.maximum(jnp.max(jnp.abs(out)), 1e-9)
        return (out / peak * 32000.0).astype(jnp.int16)

    def render_batch_i16(irs_batch, static_audio, static_snr, static_start,
                         moving_audio, moving_snr, moving_start, w_b):
        """Dispatch all B per-scene renders and start their host copies: the
        async transfers queue back-to-back on the link while later scenes still
        compute, which is where the throughput comes from."""
        outs = []
        for b in range(irs_batch.shape[0]):
            out = render_one_i16(
                irs_batch[b], static_audio[b], static_snr[b], static_start[b],
                moving_audio[b], moving_snr[b], moving_start[b], w_b[b],
            )
            try:
                out.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                pass
            outs.append(out)
        return outs

    def one_batch(seed):
        nonlocal key
        srng = np.random.default_rng(seed)

        all_sources, metas = [], []
        static_audio = np.zeros((BATCH, N_STATIC, s_pad), dtype=np.float32)
        moving_audio = np.zeros((BATCH, 1, s_pad), dtype=np.float32)
        static_snr = srng.uniform(5, 30, (BATCH, N_STATIC)).astype(np.float32)
        moving_snr = srng.uniform(5, 30, (BATCH, 1)).astype(np.float32)
        max_start = int((SCENE_SECONDS - EVENT_SECONDS) * SR)
        static_start = srng.integers(0, max_start, (BATCH, N_STATIC)).astype(np.int32)
        moving_start = srng.integers(0, max_start, (BATCH, 1)).astype(np.int32)

        for b in range(BATCH):
            statics, traj = sample_layout(srng)
            all_sources.append(np.concatenate([statics, traj]))
            for i in range(N_STATIC):
                a = pool_audio[srng.integers(len(pool_audio))]
                n = min(len(a), s_pad)
                static_audio[b, i, :n] = a[:n] / (np.abs(a[:n]).max() + 1e-15)
            a = pool_audio[srng.integers(len(pool_audio))]
            n = min(len(a), s_pad)
            moving_audio[b, 0, :n] = a[:n] / (np.abs(a[:n]).max() + 1e-15)
            metas.append(dict(seed=f"{seed}_{b}", statics=statics, starts=static_start[b]))

        sources = np.concatenate(all_sources)  # (B*13, 3)
        key, sub = jax.random.split(key)
        irs = trace_rirs_multi(
            sub, tris, absorption, scattering,
            jnp.asarray(sources, dtype=jnp.float32), caps,
            n_samples=ir_len, sr=SR, n_rays=N_RAYS, max_depth=MAX_DEPTH,
            occlusion=not mesh.is_convex,  # convex room: no interior occlusion
        )  # (4, B*13, ir_len)
        irs_batch = jnp.moveaxis(irs.reshape(4, BATCH, n_src, ir_len), 1, 0)

        out = render_batch_i16(
            irs_batch,
            jnp.asarray(static_audio),
            jnp.asarray(static_snr),
            jnp.asarray(static_start),
            jnp.asarray(moving_audio),
            jnp.asarray(moving_snr),
            jnp.asarray(moving_start),
            jnp.broadcast_to(jnp.asarray(w_interp), (BATCH,) + w_interp.shape),
        )
        return out, metas

    def drain(out, metas):
        """Host-side completion: transfer, metadata CSVs, PCM writes."""
        import pandas as pd

        for b, meta in enumerate(metas):
            arr_b = np.asarray(out[b])  # (4, T) int16, async copy already started
            frames = []
            for i, pos in enumerate(meta["statics"]):
                rel = pos - mic_center
                az = np.degrees(np.arctan2(rel[1], rel[0]))
                el = np.degrees(np.arcsin(rel[2] / np.linalg.norm(rel)))
                start_f = int(meta["starts"][i] / SR * 10)
                for fidx in range(start_f, start_f + int(EVENT_SECONDS * 10)):
                    frames.append(
                        [fidx, i % 13, i, round(az), round(el), round(np.linalg.norm(rel) * 100)]
                    )
            pd.DataFrame(frames).to_csv(
                tmp / f"meta_{meta['seed']}.csv", header=None, index=False
            )
            with open(tmp / f"scene_{meta['seed']}.pcm", "wb") as f:
                f.write(arr_b.T.tobytes())

    for i in range(N_WARMUP_BATCHES):
        drain(*one_batch(1000 + i))

    # Chip-side render throughput: inputs pre-staged on device, synced with a
    # scalar digest per batch — measures the RIR trace + full render + int16
    # quantise with no host link in the loop. On production hardware the host
    # link is PCIe (GB/s) and the full pipeline tracks this number; through the
    # development tunnel (~1-10 MB/s each way) the transfer-bound pipeline
    # number below can sit far under it.
    srng = np.random.default_rng(3000)
    staged_sources = jnp.asarray(
        np.concatenate([np.concatenate(sample_layout(srng)) for _ in range(BATCH)]),
        dtype=jnp.float32,
    )
    staged = dict(
        sa=jnp.asarray(srng.random((BATCH, N_STATIC, s_pad), np.float32)),
        ma=jnp.asarray(srng.random((BATCH, 1, s_pad), np.float32)),
        ssnr=jnp.asarray(srng.uniform(5, 30, (BATCH, N_STATIC)).astype(np.float32)),
        msnr=jnp.asarray(srng.uniform(5, 30, (BATCH, 1)).astype(np.float32)),
        sstart=jnp.asarray(srng.integers(0, t_total - s_pad, (BATCH, N_STATIC)).astype(np.int32)),
        mstart=jnp.asarray(srng.integers(0, t_total - s_pad, (BATCH, 1)).astype(np.int32)),
        w=jnp.asarray(w_interp),
    )

    def chip_batch(k):
        irs = trace_rirs_multi(
            k, tris, absorption, scattering, staged_sources, caps,
            n_samples=ir_len, sr=SR, n_rays=N_RAYS, max_depth=MAX_DEPTH,
            occlusion=not mesh.is_convex,
        )
        irs_b = jnp.moveaxis(irs.reshape(4, BATCH, n_src, ir_len), 1, 0)
        digest = jnp.float32(0)
        for b in range(BATCH):
            out = render_one_i16(
                irs_b[b], staged["sa"][b], staged["ssnr"][b], staged["sstart"][b],
                staged["ma"][b], staged["msnr"][b], staged["mstart"][b], staged["w"],
            )
            digest = digest + jnp.sum(out[:, :: SR].astype(jnp.int32))
        return digest

    _ = float(chip_batch(jax.random.PRNGKey(42)))  # warm (programs already cached)
    t0 = time.time()
    for i in range(N_MEASURE_BATCHES):
        _ = float(chip_batch(jax.random.PRNGKey(100 + i)))
    chip_elapsed = time.time() - t0
    chip_value = N_MEASURE_BATCHES * BATCH * SCENE_SECONDS / chip_elapsed

    # Pipelined measurement: batch k+1's device work dispatches before batch k's
    # host drain, overlapping transfer/IO with compute.
    t0 = time.time()
    pending = one_batch(2000)
    for i in range(1, N_MEASURE_BATCHES):
        nxt = one_batch(2000 + i)
        drain(*pending)
        pending = nxt
    drain(*pending)
    elapsed = time.time() - t0

    n_scenes = N_MEASURE_BATCHES * BATCH
    scene_seconds_per_sec = n_scenes * SCENE_SECONDS / elapsed

    print(
        json.dumps(
            {
                "metric": "60s SELD scenes rendered (scene-seconds/sec/chip, DCASE2023 format)",
                "value": round(scene_seconds_per_sec, 2),
                "unit": "scene-seconds/sec/chip",
                "vs_baseline": round(scene_seconds_per_sec / 100.0, 3),
                "chip_render_value": round(chip_value, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
