"""Typed configuration for the five pipeline tasks.

Schema mirrors the reference's ``config.yaml`` (reference config.yaml:1-19)
and the expert-knob file ``src/stat_fish_params.yaml``
(reference src/stat_fish_params.yaml:1-21).  Every task section is optional in
the YAML; accessing a missing section raises ``ConfigError`` with the same
intent as the reference's ``sys.exit(2)`` guards (reference metaseg.py:19-21).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Mapping, Optional

import yaml


class ConfigError(RuntimeError):
    """Raised for invalid or missing configuration values."""


def _require(section: Mapping[str, Any], key: str, task: str) -> Any:
    if key not in section:
        raise ConfigError(f"config section '{task}' is missing required key '{key}'")
    return section[key]


@dataclasses.dataclass(frozen=True)
class MetasegConfig:
    """reference config.yaml:14-15."""

    inpath: str


@dataclasses.dataclass(frozen=True)
class MetaOverlayConfig:
    """reference config.yaml:10-12; sensitivity validated 0-255
    (reference meta_overlay.py:34-36)."""

    inpath: str
    color_sensitivity: int

    def __post_init__(self):
        if self.color_sensitivity < 0 or self.color_sensitivity > 255:
            raise ConfigError(
                "color_sensitivity can only be between 0 and 255"
            )


@dataclasses.dataclass(frozen=True)
class StatFishConfig:
    """reference config.yaml:5-9."""

    inpath: str
    scale: Any  # numeric or the string 'auto' (reference stat_fish.py:228)
    use_min_cut: bool
    nuclei_size_T: int


@dataclasses.dataclass(frozen=True)
class IntersegConfig:
    """reference config.yaml:1-4; FISH_color validated at interseg.py:59-61."""

    inpath: str
    FISH_color: str
    has_centromeric_probe: bool

    def __post_init__(self):
        color = self.FISH_color.lower()
        if color not in ("green", "red"):
            # full reference wording (interseg.py:60): this is what the
            # pipeline's except-handler prints, so it must carry the guidance
            raise ConfigError(
                'FISH_color can only be "green" or "red". '
                "Please update the config.yaml file accordingly."
            )

    @property
    def fish_index(self) -> int:
        """Channel index of the target FISH probe (reference interseg.py:63-67)."""
        return 1 if self.FISH_color.lower() == "green" else 0


@dataclasses.dataclass(frozen=True)
class FishDistanceConfig:
    """reference config.yaml:16-19."""

    inpath: str
    centromere_probe_color: str
    fish_probe_color: str
    max_centromeric_spots: int

    _COLOR_TO_INDEX = {"red": 0, "green": 1, "blue": 2}

    @property
    def centromere_probe_index(self) -> int:
        return self._COLOR_TO_INDEX[self.centromere_probe_color]

    @property
    def fish_probe_index(self) -> int:
        return self._COLOR_TO_INDEX[self.fish_probe_color]


@dataclasses.dataclass(frozen=True)
class Config:
    raw: Mapping[str, Any]
    path: Optional[str] = None

    def _section(self, task: str) -> Mapping[str, Any]:
        if task not in self.raw or self.raw[task] is None:
            raise ConfigError(f"config has no '{task}' section")
        return self.raw[task]

    @property
    def metaseg(self) -> MetasegConfig:
        s = self._section("metaseg")
        return MetasegConfig(inpath=_require(s, "inpath", "metaseg"))

    @property
    def meta_overlay(self) -> MetaOverlayConfig:
        s = self._section("meta_overlay")
        return MetaOverlayConfig(
            inpath=_require(s, "inpath", "meta_overlay"),
            color_sensitivity=_require(s, "color_sensitivity", "meta_overlay"),
        )

    @property
    def stat_fish(self) -> StatFishConfig:
        s = self._section("stat_fish")
        return StatFishConfig(
            inpath=_require(s, "inpath", "stat_fish"),
            scale=_require(s, "scale", "stat_fish"),
            use_min_cut=_require(s, "use_min_cut", "stat_fish"),
            nuclei_size_T=_require(s, "nuclei_size_T", "stat_fish"),
        )

    @property
    def interseg(self) -> IntersegConfig:
        s = self._section("interseg")
        return IntersegConfig(
            inpath=_require(s, "inpath", "interseg"),
            FISH_color=_require(s, "FISH_color", "interseg"),
            has_centromeric_probe=_require(s, "has_centromeric_probe", "interseg"),
        )

    @property
    def fish_distance_calculation(self) -> FishDistanceConfig:
        s = self._section("fish_distance_calculation")
        return FishDistanceConfig(
            inpath=_require(s, "inpath", "fish_distance_calculation"),
            centromere_probe_color=_require(
                s, "centromere_probe_color", "fish_distance_calculation"
            ),
            fish_probe_color=_require(
                s, "fish_probe_color", "fish_distance_calculation"
            ),
            max_centromeric_spots=_require(
                s, "max_centromeric_spots", "fish_distance_calculation"
            ),
        )


@dataclasses.dataclass(frozen=True)
class StatFishParams:
    """Expert knobs (reference src/stat_fish_params.yaml:1-21).  Defaults are
    the reference's shipped values."""

    normal_threshold: float = 15
    color_sensitivity: tuple = (70, 70)
    cell_size_threshold_coeff: float = 1.25
    flow_limit: int = 60
    line_thickness: int = 2
    min_score: float = 0.95
    nms_threshold: float = 0.01
    scale_ratio: float = 0.3
    min_cc_size: int = 7
    gaussian_sigma: float = 3
    kernel_size: tuple = (7, 7)
    target_median_nuclei_size: float = 2500
    # source file these params were loaded from (None = built-in defaults);
    # stat_fish copies THIS file into the output for provenance, so the
    # recorded yaml always matches the values actually used
    path: Optional[str] = None

    @classmethod
    def from_mapping(cls, m: Mapping[str, Any]) -> "StatFishParams":
        kwargs = {}
        for field in dataclasses.fields(cls):
            if field.name in m:
                v = m[field.name]
                if isinstance(v, list):
                    v = tuple(v)
                kwargs[field.name] = v
        return cls(**kwargs)


def load_config(path: str = "config.yaml") -> Config:
    if not os.path.exists(path):
        raise ConfigError(f"config file not found: {path}")
    with open(path) as f:
        raw = yaml.safe_load(f)
    if not isinstance(raw, Mapping):
        raise ConfigError(f"config file {path} did not parse to a mapping")
    return Config(raw=raw, path=os.path.abspath(path))


def _default_params_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "stat_fish_params.yaml")


def load_stat_fish_params(path: Optional[str] = None) -> StatFishParams:
    if path is None:
        path = _default_params_path()
    if not os.path.exists(path):
        return StatFishParams()
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    p = StatFishParams.from_mapping(raw)
    return dataclasses.replace(p, path=os.path.abspath(path))
