"""Multi-chip scene rendering: compile scenes to plans, shard a batch over a mesh.

Run on real TPU chips, or anywhere with a virtual device mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/04_sharded_batch.py
"""

import tempfile
from pathlib import Path

import jax
import numpy as np

from audiblelight_tpu import Scene
from audiblelight_tpu.io.audio import wav_write
from audiblelight_tpu.parallel import make_mesh, render_batch, shard_render, stack_plans
from audiblelight_tpu.render import build_scene_plan

SR = 24000


def build_scene(root: Path, seed: int) -> Scene:
    fg = root / "fg" / "music"
    if not fg.exists():
        fg.mkdir(parents=True)
        t = np.arange(SR * 2) / SR
        wav_write(fg / "tone.wav",
                  (0.5 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), SR)
    scene = Scene(duration=5.0, backend="shoebox", sample_rate=SR,
                  backend_kwargs=dict(dimensions=[6, 4, 3], max_order=10,
                                      max_ir_length=0.25, seed=seed),
                  fg_path=root / "fg")
    scene.add_microphone(microphone_type="ambeovr", position=[3, 2, 1.5])
    scene.add_event(event_type="static", filepath=fg / "tone.wav",
                    scene_start=0.5 + 0.15 * (seed % 8), duration=2.0, snr=10.0)
    return scene


def main() -> None:
    root = Path(tempfile.mkdtemp())
    n_dev = len(jax.devices())
    print(f"{n_dev} devices: {jax.devices()}")

    # One scene per mesh 'scene'-axis slot x chan shards handled inside
    n_scenes = max(n_dev, 4)
    scenes = [build_scene(root, s) for s in range(n_scenes)]
    for s in scenes:
        s.state.simulate()
    plans = [build_scene_plan(s) for s in scenes]
    batch = stack_plans(plans)

    # Mesh axes: scenes shard over "scene", capsule channels over "chan"
    mesh = make_mesh(n_scene=max(n_dev // 2, 1), n_chan=2 if n_dev >= 2 else 1)
    sharded = np.asarray(shard_render(batch, mesh))

    local = np.asarray(render_batch(batch))  # single-device reference
    print(f"batch audio {sharded.shape}; sharded == local: {np.array_equal(sharded, local)}")


if __name__ == "__main__":
    main()
