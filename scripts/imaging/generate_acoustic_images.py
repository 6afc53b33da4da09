#!/usr/bin/env python
"""Generate APGD acoustic images + segmentation labels for rendered scenes.

Reference scripts/imaging/generate_acoustic_images.py surface: for each scene,
render audio (Eigenmike32 by default, since APGD wants many capsules), compute
the (tesselation, bands, frames) acoustic image, and dump segmentation JSON +
HDF per microphone. The APGD solve runs on device (audiblelight_tpu.imaging).
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from audiblelight_tpu import config, utils
from audiblelight_tpu.core import Scene
from audiblelight_tpu.utils import logger


def generate_scene_with_image(args, idx: int, rng: np.random.Generator) -> None:
    out_dir = Path(args.output_dir) / f"scene_{idx:04d}"
    if (out_dir / "acoustic_image_mic000.hdf").is_file():
        logger.info(f"Skipping existing scene {idx}")
        return
    out_dir.mkdir(parents=True, exist_ok=True)

    dims = rng.uniform([5.0, 4.0, 2.6], [9.0, 7.0, 3.4])
    scene = Scene(
        duration=args.duration,
        backend="shoebox",
        backend_kwargs=dict(
            dimensions=dims.tolist(),
            absorption=float(rng.uniform(0.3, 0.7)),
            max_order=8,
            max_ir_length=0.3,
            seed=int(rng.integers(2**31)),
        ),
        fg_path=args.fg_dir,
        class_mapping="DCASE2023Task3",
    )
    scene.add_microphone(microphone_type="eigenmike32")

    for _ in range(int(rng.integers(1, args.max_events + 1))):
        try:
            scene.add_event(event_type="static", max_place_attempts=100)
        except (ValueError, FileNotFoundError) as e:
            logger.warning(f"Could not place event: {e}")
    if len(scene.events) == 0:
        logger.warning(f"No events placed for scene {idx}; skipping")
        return

    scene.generate(output_dir=out_dir, audio=True, metadata_json=True, metadata_dcase=True)
    scene.generate_acoustic_image(
        output_dir=out_dir,
        nbands=args.nbands,
        sh_order=args.sh_order,
        frame_cap=args.frame_cap,
    )


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--fg-dir", type=str, required=True)
    parser.add_argument("--output-dir", type=str, required=True)
    parser.add_argument("--n-scenes", type=int, default=5)
    parser.add_argument("--duration", type=float, default=10.0)
    parser.add_argument("--max-events", type=int, default=3)
    parser.add_argument("--nbands", type=int, default=config.AIMG_NBANDS)
    parser.add_argument("--sh-order", type=int, default=config.AIMG_SH_ORDER)
    parser.add_argument("--frame-cap", type=int, default=config.AIMG_FRAME_CAP)
    parser.add_argument("--seed", type=int, default=utils.SEED)
    args = parser.parse_args()

    rng = np.random.default_rng(args.seed)
    for idx in range(args.n_scenes):
        logger.warning(f"[{idx + 1}/{args.n_scenes}] generating acoustic image scene")
        generate_scene_with_image(args, idx, rng)


if __name__ == "__main__":
    main()
