"""Scanned-room scene with a raycast panorama video.

A nonconvex, high-face-count room (the Gibson-scan regime) rendered end to end:
stochastic ray-traced RIRs with occlusion, a spatial event mix, and a video
whose background is the room itself — raycast equirectangularly with the
framework's first-hit kernels (no VTK/OpenCV).

Run:  PYTHONPATH=. python examples/07_scanned_room_video.py [output_dir]
"""

import sys
import tempfile
from pathlib import Path

import numpy as np

from audiblelight_tpu.core import Scene
from audiblelight_tpu.geometry.mesh import scanned_like_room
from audiblelight_tpu.io.audio import wav_write

out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp(prefix="al_scanned_"))
out.mkdir(parents=True, exist_ok=True)

# A watertight nonconvex interior standing in for a license-gated Gibson scan.
# Raise subdivision_levels to 5 for the full ~10^5-face tracing workload.
room = scanned_like_room(extents=(6.0, 4.5, 2.8), n_furniture=5,
                         subdivision_levels=3, seed=7)
print(f"room: {len(room.faces)} faces, convex={room.is_convex}")

# Foreground pool: two synthetic class-labelled sounds
fg = out / "fg"
sr = 24000
t = np.arange(2 * sr) / sr
(fg / "music").mkdir(parents=True)
wav_write(fg / "music" / "arp.wav",
          (0.5 * np.sin(2 * np.pi * 440 * t) * np.exp(-t * 2)).astype(np.float32), sr)
(fg / "femaleSpeech").mkdir()
rng = np.random.default_rng(0)
wav_write(fg / "femaleSpeech" / "speech.wav",
          (0.3 * rng.standard_normal(len(t)) * np.exp(-t)).astype(np.float32), sr)

scene = Scene(
    duration=8.0,
    backend="rlr",
    sample_rate=sr,
    fg_path=fg,
    backend_kwargs=dict(
        mesh=room,
        rlr_kwargs=dict(indirect_ray_count=1000, indirect_ray_depth=20,
                        max_ir_length=0.8),
    ),
)
scene.add_microphone(microphone_type="ambeovr", alias="m")  # auto-placed
scene.add_event(event_type="static", alias="arp",
                scene_start=0.5, event_start=0.0, duration=2.0)
scene.add_event(event_type="moving", shape="linear", alias="walker",
                scene_start=3.0, event_start=0.0, duration=3.0)
scene.add_ambience(noise="pink")

scene.generate(output_dir=out, video=True)
print(f"outputs in {out}:")
for p in sorted(out.iterdir()):
    if p.is_file():
        print("  ", p.name)
