"""meta_overlay: FISH colocalization statistics on metaseg outputs.

Parity target: reference src/meta_overlay.py:14-102 + the FISH split at
src/image_tools.py:136-146.  Per RGB image: threshold red/green at
``color_sensitivity``, write inverted red/green PNGs, mask FISH outside
nuclei, compute the 10 per-image statistics and emit
``fish_quantification.csv`` in the reference's exact column order --
including the quirk that the three ``count_cc`` statistics are stored as
``(count, total_px)`` 2-tuples (reference meta_overlay.py:70-71,79 stores the
raw tuple from image_tools.py:114-119).
"""

from __future__ import annotations

import os
import sys
from typing import Optional, Tuple, Union

import numpy as np
import pandas as pd

from ..core import imgio
from ..runtime.trace import stage
from ..core.config import Config, ConfigError, load_config
from ..ops.cc import count_cc
from ..ops.meta_post import count_HSR, count_colocalization

HSR_SIZE_THRESHOLD = 20  # reference src/meta_overlay.py:12


def split_FISH_channels(
    I: np.ndarray, image_path: str, sensitivity: int
) -> Union[int, Tuple[np.ndarray, np.ndarray]]:
    """Threshold the red/green channels, writing inverted grayscale PNGs to
    red/ and green/ (reference src/image_tools.py:136-146).  Returns 0 for
    non-RGB input (the caller's skip signal)."""
    path_split = os.path.split(image_path)
    if len(I.shape) < 3:
        print(
            image_path,
            " isn't an RGB image. Therefore, no FISH signals could be identified. Skipping...",
        )
        return 0

    I = imgio.u16_to_u8(I)
    imgio.save_gray_inverted(
        os.path.join(path_split[0], "red", path_split[1] + ".png"), I[..., 0]
    )
    imgio.save_gray_inverted(
        os.path.join(path_split[0], "green", path_split[1] + ".png"), I[..., 1]
    )
    return (np.array(I[..., 0]) > sensitivity), (np.array(I[..., 1]) > sensitivity)


def read_seg(image_path: str):
    """labels/<name>.npy -> 4 class masks (reference src/utils.py:125-132)."""
    path_split = os.path.split(image_path)
    seg = np.load(
        os.path.join(path_split[0], "labels", path_split[1][:-4] + ".npy")
    )
    return seg == 0, seg == 1, seg == 2, seg == 3


def main(argv=None, config: Optional[Config] = None) -> int:
    from ..runtime.hostmem import tune_host_allocator

    tune_host_allocator()
    if config is None:
        config = load_config()
    try:
        var = config.meta_overlay
    except ConfigError as e:
        print(str(e))
        return 2
    inpath = var.inpath
    sensitivity = var.color_sensitivity

    if not os.path.isdir(inpath):
        print("Input folder does not exist. Exiting...")
        return 2
    if not os.path.isdir(os.path.join(inpath, "labels")):
        print("`labels` folder is missing in the input folder.")
        print(
            "Please make sure metaseg was run on the input folder first. This will generate the labels folder."
        )
        return 2
    if not os.path.isdir(os.path.join(inpath, "dapi")):
        print("`dapi` folder is missing in the input folder.")
        print(
            "Please make sure metaseg was run on the input folder first. This will generate the labels folder."
        )
        return 2

    os.makedirs(os.path.join(inpath, "red"), exist_ok=True)
    os.makedirs(os.path.join(inpath, "green"), exist_ok=True)

    image_paths = imgio.get_imgs(inpath)
    first_fish = "green"
    second_fish = "red"

    def _process(i):
        """One image end-to-end: decode + channel split (PNG writes) + the
        ten statistics.  Returns the CSV row dict, or None for the non-RGB
        skip signal.  Pure per-image work -- safe to fan out over devices."""
        path_split = os.path.split(i)
        print("Processing image: ", i)
        with stage("meta_overlay.read+split"):
            I = imgio.imread_rgb(i)
            res = split_FISH_channels(I, i, sensitivity)
            if not isinstance(res, tuple):
                return None
            red, green = res
            fish = green
            fish2 = red

            _, nuclei, chrom, ec = read_seg(i)

        from ..runtime.devicepath import use_device_path

        with stage("meta_overlay.stats"):
            if use_device_path():
                # all ten statistics in ONE fused device program (the host path
                # rescans the image per component -- see ops/overlay_tpu.py)
                import jax
                import jax.numpy as jnp

                from ..ops.overlay_tpu import cc_pair_host_quirk, overlay_stats_tpu

                stats = jax.tree.map(
                    int,
                    jax.device_get(
                        overlay_stats_tpu(
                            jnp.asarray(red),
                            jnp.asarray(green),
                            jnp.asarray(nuclei),
                            jnp.asarray(chrom),
                            jnp.asarray(ec),
                            HSR_SIZE_THRESHOLD,
                        )
                    ),
                )

                def _cc_pair(pair, hw=nuclei.shape[0] * nuclei.shape[1]):
                    return cc_pair_host_quirk(pair, hw)

                num_ecDNA = _cc_pair(stats["num_ecDNA"])
                num_FISH = _cc_pair(stats["num_FISH"])
                num_ecDNA_FISH = stats["num_ecDNA_FISH"]
                num_HSR = stats["num_HSR"]
                num_FISH2 = _cc_pair(stats["num_FISH2"])
                num_FISH_FISH2 = stats["num_FISH_FISH2"]
                num_ecDNA_FISH2 = stats["num_ecDNA_FISH2"]
                num_ecDNA_FISH_FISH2 = stats["num_ecDNA_FISH_FISH2"]
                num_HSR2 = stats["num_HSR2"]
            else:
                fish = fish * ~nuclei
                num_ecDNA = count_cc(ec)  # (count, px) tuple stored verbatim
                num_FISH = count_cc(fish * ~chrom)
                num_ecDNA_FISH = count_colocalization(ec, fish)
                num_HSR = count_HSR(chrom, fish, HSR_SIZE_THRESHOLD)

                fish2 = fish2 * ~nuclei
                num_FISH2 = count_cc(fish2 * ~chrom)
                num_FISH_FISH2 = count_colocalization(fish * ~chrom, fish2 * ~chrom)
                num_ecDNA_FISH2 = count_colocalization(ec, fish2)
                num_ecDNA_FISH_FISH2 = count_colocalization(ec, fish2 * fish)
                num_HSR2 = count_HSR(chrom, fish2, HSR_SIZE_THRESHOLD)

        return {
            "image_name": path_split[1],
            "# of ecDNA (DAPI)": num_ecDNA,
            f"# of ecDNA (DAPI and {first_fish})": num_ecDNA_FISH,
            f"# of ecDNA ({first_fish})": num_FISH,
            f"# of HSR ({first_fish})": num_HSR,
            f"# of ecDNA (DAPI and {second_fish})": num_ecDNA_FISH2,
            f"# of ecDNA (DAPI and {second_fish} and {first_fish})": num_ecDNA_FISH_FISH2,
            f"# of ecDNA ({second_fish} and {first_fish})": num_FISH_FISH2,
            f"# of ecDNA ({second_fish})": num_FISH2,
            f"# of HSR ({second_fish})": num_HSR2,
        }

    # Images are embarrassingly parallel (the reference is a per-image loop,
    # src/meta_overlay.py:56-95): on a multi-device mesh fan them out
    # data-parallel, one worker thread per device (jax.default_device is
    # thread-local), rows re-emitted in input order so the CSV bytes match
    # the sequential path.  ECSEG_OVERLAY_SHARD=0 forces sequential.
    import jax

    devices = jax.devices()
    shard = len(devices) > 1 and os.environ.get(
        "ECSEG_OVERLAY_SHARD", "1"
    ).strip().lower() not in ("0", "false", "no", "off")
    if shard:
        import concurrent.futures as cf

        def _work(idx, i):
            with jax.default_device(devices[idx % len(devices)]):
                return _process(i)

        with cf.ThreadPoolExecutor(max_workers=len(devices)) as pool:
            results = list(pool.map(_work, range(len(image_paths)), image_paths))
    else:
        results = [_process(i) for i in image_paths]
    rows = [r for r in results if r is not None]
    path_split = os.path.split(image_paths[-1]) if image_paths else None

    if not rows:
        # (the reference crashes reordering an empty frame; we just exit)
        return 0
    df = pd.DataFrame(rows)
    df = df[
        [
            "image_name",
            "# of ecDNA (DAPI)",
            f"# of ecDNA ({first_fish})",
            f"# of ecDNA ({second_fish})",
            f"# of ecDNA (DAPI and {first_fish})",
            f"# of ecDNA (DAPI and {second_fish})",
            f"# of ecDNA ({second_fish} and {first_fish})",
            f"# of ecDNA (DAPI and {second_fish} and {first_fish})",
            f"# of HSR ({second_fish})",
            f"# of HSR ({first_fish})",
        ]
    ]
    if path_split is not None:
        df.to_csv(os.path.join(path_split[0], "fish_quantification.csv"), index=False)
    from ..runtime import fallbacks

    fallbacks.report()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
