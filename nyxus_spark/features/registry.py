"""Feature registry: name → kernel section, with group expansion and
select-list-driven pruning.

Mirrors the reference's FeatureSet enumeration + named groups
(/root/reference/src/nyx/featureset.h:933-982) and its per-family gating
(`required(theFeatureSet)`, src/nyx/features/intensity.cpp:9-46): a kernel
section runs only if at least one of its features is requested — the engine's
analog of Catalyst column pruning, applied before the UDF is even built.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np

from nyxus_spark.features.segmented import Segments
from nyxus_spark.settings import FeatureSettings


@dataclass(frozen=True)
class Section:
    name: str
    fn: Callable[[Segments, FeatureSettings], dict[str, np.ndarray]]
    features: tuple[str, ...]


def _sections() -> dict[str, Section]:
    # imports deferred so executors unpickle only what a job uses
    from nyxus_spark.features.firstorder import (
        FIRSTORDER_FEATURES, HISTO_FEATURES, firstorder_section, histo_section,
    )

    secs = [
        Section("firstorder", firstorder_section, tuple(FIRSTORDER_FEATURES)),
        Section("histo", histo_section, tuple(HISTO_FEATURES)),
    ]
    try:
        from nyxus_spark.features.ih import IH_FEATURES, ih_section

        secs.append(Section("ih", ih_section, tuple(IH_FEATURES)))
    except ImportError:
        pass
    try:
        from nyxus_spark.features.texture import TEXTURE_SECTIONS

        secs.extend(TEXTURE_SECTIONS)
    except ImportError:
        pass
    try:
        from nyxus_spark.features.moments import MOMENTS_FEATURES, moments_section

        secs.append(Section("moments", moments_section, tuple(MOMENTS_FEATURES)))
    except ImportError:
        pass
    try:
        from nyxus_spark.features.signal import (
            GABOR_FEATURES, RADIAL_FEATURES, gabor_section, radial_section,
        )

        secs.append(Section("gabor", gabor_section, tuple(GABOR_FEATURES)))
        secs.append(Section("radial", radial_section, tuple(RADIAL_FEATURES)))
    except ImportError:
        pass
    return {s.name: s for s in secs}


def all_sections() -> dict[str, Section]:
    return _sections()


def feature_to_section() -> dict[str, str]:
    return {f: s.name for s in _sections().values() for f in s.features}


def list_feature_groups() -> dict[str, list[str]]:
    """Available group names (*ALL*, *ALL_GLCM*, *ALL_GLCM_MULTI*, …) →
    member feature lists — the engine's analog of the reference's named
    featureset groups (featureset.h:933-982)."""
    return _register_groups()


def _register_groups() -> dict[str, list[str]]:
    secs = _sections()
    groups: dict[str, list[str]] = {
        "*ALL_INTENSITY*": list(secs["firstorder"].features),
    }
    if "ih" in secs:
        groups["*ALL_IH*"] = list(secs["ih"].features)
    if "histo" in secs:
        groups["*ALL_HISTO*"] = list(secs["histo"].features)
    for tex in ("glcm", "glrlm", "glszm", "gldm", "ngtdm",
                "glcm_multi", "glrlm_multi"):
        if tex in secs:
            groups[f"*ALL_{tex.upper()}*"] = list(secs[tex].features)
    if "moments" in secs:
        groups["*ALL_MOMENTS*"] = list(secs["moments"].features)
    # family groups are prefix-derived so each *ALL_X* contains exactly its
    # own codes even when families share a host section (GLSZM/GLDZM ride the
    # GLRLM run machinery, NGLDM the GLDM dependence matrix)
    for prefix in ("GLRLM", "GLSZM", "GLDZM", "GLDM", "NGLDM"):
        members = [
            f for s in secs.values() if not s.name.endswith("_multi")
            for f in s.features if f.startswith(prefix + "_")
        ]
        if members:
            groups[f"*ALL_{prefix}*"] = members
    # *ALL* = the single-offset catalog (the engine's default output, like the
    # reference's default featureset); the per-offset + _AVE expansions are
    # opt-in via *ALL_GLCM_MULTI* / *ALL_GLRLM_MULTI* to keep the flagship
    # pipeline's column count stable
    every: list[str] = []
    for s in secs.values():
        if s.name.endswith("_multi") or s.name == "histo":
            continue
        every.extend(s.features)
    groups["*ALL*"] = every
    # reference-parity escape group (featureset.cpp:662 *ALL_BUT_GABOR*):
    # Gabor is the one convolutional family — an order of magnitude more
    # arithmetic per token than any statistical section — so the reference
    # names a group that excludes exactly it. The flagship pipeline/bench
    # catalog uses this group; Gabor stays a first-class opt-in
    # (*ALL_GABOR* / explicit codes) with its own driver-gated query.
    if "gabor" in secs:
        gset = set(secs["gabor"].features)
        groups["*ALL_BUT_GABOR*"] = [f for f in every if f not in gset]
        groups["*ALL_GABOR*"] = list(secs["gabor"].features)
    return groups


def resolve_features(features: list[str] | None) -> list[str]:
    """Expand group names, dedupe, preserve order. None → *ALL_INTENSITY*."""
    groups = _register_groups()
    if features is None:
        features = ["*ALL_INTENSITY*"]
    known = feature_to_section()
    out: list[str] = []
    seen: set[str] = set()
    for f in features:
        expansion = groups.get(f, [f]) if f.startswith("*") else [f]
        if f.startswith("*") and f not in groups:
            raise ValueError(f"unknown feature group: {f}")
        for g in expansion:
            if g not in known:
                raise ValueError(f"unknown feature: {g}")
            if g not in seen:
                seen.add(g)
                out.append(g)
    return out


def plan_sections(features: list[str]) -> list[Section]:
    """Minimal set of kernel sections covering the requested features."""
    f2s = feature_to_section()
    secs = _sections()
    needed: list[Section] = []
    seen: set[str] = set()
    for f in features:
        s = f2s[f]
        if s not in seen:
            seen.add(s)
            needed.append(secs[s])
    return needed
