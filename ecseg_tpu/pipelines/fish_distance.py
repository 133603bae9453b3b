"""fish_distance_calculation: normalized FISH-to-centromere distances.

Parity target: reference src/fish_distance_calculation.py:15-83.  Per
nucleus: min distance from each FISH-probe focus to the nearest
centromere-probe pixel, normalized by sqrt(cell area); cells with more than
``max_centromeric_spots`` FISH blobs are skipped; emits
``centromere_distances.csv`` with one ``normalized_distance`` column.
"""

from __future__ import annotations

import glob
import os
import sys
from typing import List, Optional

import numpy as np
import pandas as pd

from ..core import imgio
from ..core.config import Config, load_config
from ..ops.cc import label as cc_label, regionprops


def get_distances_img(lsq, segmentation, presets) -> List[float]:
    centromere_idx, fish_idx, max_spots = presets
    distances: List[float] = []
    for cell in regionprops(segmentation):
        seg_cutout = (segmentation[cell.slice] == cell.label).astype(int)
        if (lsq[cell.slice][..., 0] * seg_cutout).any() and (
            lsq[cell.slice][..., 1] * seg_cutout
        ).any():
            sqrt_area = np.sqrt(seg_cutout.sum())
            lsq_cutout = lsq[cell.slice] * np.expand_dims(seg_cutout, 2)

            grid = np.dstack(
                np.meshgrid(*[np.arange(d) for d in seg_cutout.shape[::-1]])
            )
            dist_map = np.zeros(seg_cutout.shape)

            fish_probe = lsq_cutout[..., fish_idx].astype(bool)
            centromere_probe = lsq_cutout[..., centromere_idx].astype(bool)

            labeled_fish = cc_label(fish_probe)
            if labeled_fish.max() > max_spots:
                continue

            fish_coords = grid[fish_probe]
            cent_coords = grid[centromere_probe]

            for fc in fish_coords:
                dist_map[fc[1], fc[0]] = (
                    np.linalg.norm(cent_coords - fc, axis=1).min() / sqrt_area
                )

            distances.append(float("inf"))
            for spot in regionprops(labeled_fish):
                spot_cutout = labeled_fish[spot.slice] == spot.label
                distances[-1] = min(
                    distances[-1], dist_map[spot.slice][spot_cutout].min()
                )
    return distances


def get_distances_path(root_directory: str, *presets) -> List[float]:
    distances = []
    for img_path in glob.glob(f"{root_directory}/*.tif"):
        img_name = os.path.basename(img_path)[:-4]
        img_directory = f"{root_directory}/annotated/{img_name}"
        assert os.path.isdir(img_directory)
        seg_path = f"{img_directory}/{img_name}__segmentation_min_cut.npy"
        lsq_path = glob.glob(f"{img_directory}/{img_name}_lsq*.tif")[0]

        segmentation = np.load(seg_path)
        lsq = imgio.imread_rgb(lsq_path)
        distances.append(get_distances_img(lsq, segmentation, presets))
    return [y for x in distances for y in x]


def main(argv=None, config: Optional[Config] = None) -> int:
    if config is None:
        config = load_config()
    var = config.fish_distance_calculation
    directory = var.inpath
    assert os.path.exists(f"{directory}/annotated")

    distances = get_distances_path(
        directory,
        var.centromere_probe_index,
        var.fish_probe_index,
        var.max_centromeric_spots,
    )
    pd.DataFrame({"normalized_distance": distances}).to_csv(
        f"{directory}/centromere_distances.csv", index=False
    )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
