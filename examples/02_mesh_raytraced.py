"""Ray-traced mesh backend: load a room mesh, place a moving event, render.

Builds a box-room OBJ on the fly; swap in any GLB/OBJ/PLY scan (e.g. Gibson):

    python examples/02_mesh_raytraced.py [output_dir]

On a TPU backend the tracer's first-hit queries run through the Pallas kernel
automatically; on CPU the identical chunked XLA path runs.
"""

import sys
import tempfile
from pathlib import Path

import numpy as np

from audiblelight_tpu import Scene
from audiblelight_tpu.geometry.mesh import box_mesh
from audiblelight_tpu.io.audio import wav_write

SR = 44100


def write_box_obj(path: Path, extents, center) -> Path:
    mesh = box_mesh(extents=extents, center=center)
    with open(path, "w") as f:
        for v in mesh.vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in mesh.faces:
            f.write(f"f {face[0] + 1} {face[1] + 1} {face[2] + 1}\n")
    return path


def main(output_dir: Path) -> None:
    output_dir.mkdir(parents=True, exist_ok=True)
    room = write_box_obj(output_dir / "room.obj", [8.0, 6.0, 3.0], [4.0, 3.0, 1.5])

    fg = output_dir / "fg" / "music"
    fg.mkdir(parents=True, exist_ok=True)
    t = np.arange(SR * 3) / SR
    wav_write(fg / "tone.wav",
              (0.5 * np.sin(2 * np.pi * 440 * t) * np.exp(-t)).astype(np.float32), SR)

    scene = Scene(
        duration=6.0,
        backend="rlr",
        backend_kwargs=dict(
            mesh=room,
            material="Carpet",                       # per-band absorption from the material DB
            rlr_kwargs=dict(indirect_ray_count=2048,  # rays per source
                            indirect_ray_depth=48),   # bounces
        ),
        fg_path=output_dir / "fg",
    )
    scene.add_microphone(microphone_type="foalistener", position=[4.0, 3.0, 1.5])

    # A moving event: semicircular trajectory sampled inside the room
    scene.add_event(event_type="moving", filepath=fg / "tone.wav", shape="semicircular",
                    scene_start=0.5, duration=3.0, velocity=1.2, resolution=2.0, snr=10.0)

    out = output_dir / "scene"
    out.mkdir(exist_ok=True)
    scene.generate(output_dir=out)

    audio = scene.audio["mic000"]
    ev = scene.get_events()[0]
    print(f"FOA render {audio.shape}; event moved through {len(ev.emitters)} waypoints")
    print("wrote:", sorted(p.name for p in out.iterdir()))


if __name__ == "__main__":
    target = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp())
    main(target)
