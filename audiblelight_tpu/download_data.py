"""Data-acquisition helpers (re-exported download functions).

Reference audiblelight/download_data.py:39-46 surface: FSD50K sound events, FMA
music, Gibson meshes + waypoints, measured RIRs (-> SOFA), and VisualGenome
images. All network paths are gated on the optional `requests`/`gdown`/`soundata`
dependencies with descriptive errors (this build environment has zero egress);
offline conversion utilities (RIR arrays -> SOFA) work without network.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

from audiblelight_tpu.utils import logger, safe_import

_NETWORK_MSG = (
    "requires network access and the '{pkg}' package. In an offline environment, "
    "place the files manually in the target directory."
)

# Canonical dataset sources (for manual acquisition)
FSD50K_ZENODO = "https://zenodo.org/records/4060432"
FMA_GITHUB = "https://github.com/mdeff/fma"
GIBSON_FORM = "https://forms.gle/36TW9uVpjrE1Mkf9A"  # Gibson database access form
TAU_SRIR_ZENODO = "https://zenodo.org/records/6408611"
VISUALGENOME = "https://homes.cs.washington.edu/~ranjay/visualgenome/index.html"


def download_fsd(output_dir: Union[str, Path], class_mapping: Optional[str] = "DCASE2023Task3"):
    """Download FSD50K via soundata and sort clips into class-labelled folders."""
    soundata = safe_import("soundata", f"download_fsd {_NETWORK_MSG.format(pkg='soundata')}")
    dataset = soundata.initialize("fsd50k", data_home=str(output_dir))
    dataset.download()
    logger.warning(
        "FSD50K downloaded; organise clips into <class>/<file>.wav folders matching "
        f"the {class_mapping} label names so Scene.fg_path class inference works."
    )
    return Path(output_dir)


def download_fma(output_dir: Union[str, Path], subset: str = "small"):
    """Download the FMA music dataset (used for 'music'-class events)."""
    safe_import("requests", f"download_fma {_NETWORK_MSG.format(pkg='requests')}")
    raise NotImplementedError(
        f"Fetch fma_{subset}.zip from {FMA_GITHUB} and extract into {output_dir}."
    )


def download_gibson(output_dir: Union[str, Path]):
    """Download Gibson environment meshes (requires signed access form + gdown)."""
    safe_import("gdown", f"download_gibson {_NETWORK_MSG.format(pkg='gdown')}")
    raise NotImplementedError(
        f"Gibson meshes require accepting the license at {GIBSON_FORM}; after access "
        f"is granted, download the glb archive into {output_dir}."
    )


def download_gibson_waypoints(output_dir: Union[str, Path]):
    """Download navigation waypoint JSONs for the Gibson meshes."""
    safe_import("gdown", f"download_gibson_waypoints {_NETWORK_MSG.format(pkg='gdown')}")
    raise NotImplementedError(
        f"Download the waypoints archive into {output_dir}/waypoints/gibson/."
    )


def download_rirs(output_dir: Union[str, Path], dataset: str = "tau"):
    """Download measured RIR datasets and convert them to SOFA files.

    See scripts/download_data/download_rirs.py for the offline conversion half
    (numpy IR arrays -> SingleRoomSRIR SOFA via audiblelight_tpu.io.sofa).
    """
    safe_import("requests", f"download_rirs {_NETWORK_MSG.format(pkg='requests')}")
    raise NotImplementedError(
        f"Fetch the archive from {TAU_SRIR_ZENODO} into {output_dir}, then run "
        f"`python scripts/download_data/download_rirs.py convert ...`."
    )


def download_visualgenome(output_dir: Union[str, Path]):
    """Download VisualGenome images keyed to sound-event class labels."""
    safe_import("requests", f"download_visualgenome {_NETWORK_MSG.format(pkg='requests')}")
    raise NotImplementedError(
        f"Fetch images from {VISUALGENOME} and sort into <class>/<image> folders "
        f"under {output_dir} for Scene.image_path."
    )


__all__ = [
    "download_fsd",
    "download_fma",
    "download_gibson",
    "download_gibson_waypoints",
    "download_rirs",
    "download_visualgenome",
]
