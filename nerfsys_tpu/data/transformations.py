"""Coordinate-frame and geodetic transformations (host-side numpy).

Counterpart of /root/reference/adaptive_nerf/data/transformations.py, with the
pymap3d dependency replaced by self-contained WGS84 formulas (pymap3d is not
available in this image; the math is the standard closed-form geodetic <->
ECEF <-> ENU chain).

Frame conventions (must hold system-wide — see SURVEY.md §1):
  - COLMAP camera basis: RDF (Right, Down, Forward)
  - Render camera basis: RUB (Right, Up, Back)
  - World basis:        DRB (Down, Right, Back)
  - ENU -> DRB: Down = -Up, Right = East, Back = -North
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

# --------------------------- basis matrices ---------------------------------
RDF_TO_DRB = np.array(
    [
        [0.0, 1.0, 0.0],   # Down  <- RDF y
        [1.0, 0.0, 0.0],   # Right <- RDF x
        [0.0, 0.0, -1.0],  # Back  <- -RDF z
    ],
    dtype=np.float64,
)

ENU_TO_DRB = np.array(
    [
        [0.0, 0.0, -1.0],  # Down  <- -Up
        [1.0, 0.0, 0.0],   # Right <- East
        [0.0, -1.0, 0.0],  # Back  <- -North
    ],
    dtype=np.float64,
)

RDF_TO_RUB = np.diag([1.0, -1.0, -1.0]).astype(np.float64)

# --------------------------- WGS84 ellipsoid --------------------------------
WGS84_A = 6378137.0  # semi-major axis [m]
WGS84_B = 6356752.314245179  # semi-minor axis [m]
WGS84_E2 = 1.0 - (WGS84_B**2) / (WGS84_A**2)  # first eccentricity squared


def geodetic_to_ecef(lat_deg, lon_deg, alt_m) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Geodetic (deg, deg, m) -> ECEF (m). Vectorized."""
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lon = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    h = np.asarray(alt_m, dtype=np.float64)
    sB, cB = np.sin(lat), np.cos(lat)
    N = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sB * sB)
    x = (N + h) * cB * np.cos(lon)
    y = (N + h) * cB * np.sin(lon)
    z = (N * (1.0 - WGS84_E2) + h) * sB
    return x, y, z


def ecef_to_geodetic(x, y, z) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ECEF (m) -> geodetic (deg, deg, m) via Bowring's iteration (3 rounds,
    sub-millimeter for terrestrial points). Vectorized."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    lon = np.arctan2(y, x)
    p = np.hypot(x, y)
    # initial guess
    lat = np.arctan2(z, p * (1.0 - WGS84_E2))
    for _ in range(3):
        sB = np.sin(lat)
        N = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sB * sB)
        h = p / np.cos(lat) - N
        lat = np.arctan2(z, p * (1.0 - WGS84_E2 * N / (N + h)))
    sB = np.sin(lat)
    N = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sB * sB)
    h = p / np.cos(lat) - N
    return np.rad2deg(lat), np.rad2deg(lon), h


def ecef_to_enu_rot(lat_deg: float, lon_deg: float) -> np.ndarray:
    """Rotation mapping ECEF vectors to ENU components at (lat, lon):
    v_enu = Q @ v_ecef. Rows are the ENU unit axes in ECEF."""
    lat = np.deg2rad(lat_deg)
    lon = np.deg2rad(lon_deg)
    sL, cL = np.sin(lon), np.cos(lon)
    sB, cB = np.sin(lat), np.cos(lat)
    return np.array(
        [
            [-sL, cL, 0.0],
            [-sB * cL, -sB * sL, cB],
            [cB * cL, cB * sL, sB],
        ],
        dtype=np.float64,
    )


def ecef_to_enu(x, y, z, lat_ref, lon_ref, alt_ref) -> np.ndarray:
    """ECEF points -> ENU offsets (..., 3) about the reference geodetic point."""
    x0, y0, z0 = geodetic_to_ecef(lat_ref, lon_ref, alt_ref)
    Q = ecef_to_enu_rot(lat_ref, lon_ref)
    d = np.stack(
        [np.asarray(x) - x0, np.asarray(y) - y0, np.asarray(z) - z0], axis=-1
    )
    return d @ Q.T


def enu_to_ecef(e, n, u, lat_ref, lon_ref, alt_ref) -> np.ndarray:
    """ENU offsets -> ECEF points (..., 3)."""
    x0, y0, z0 = geodetic_to_ecef(lat_ref, lon_ref, alt_ref)
    Q = ecef_to_enu_rot(lat_ref, lon_ref)
    enu = np.stack([np.asarray(e), np.asarray(n), np.asarray(u)], axis=-1)
    return enu @ Q + np.array([x0, y0, z0])


def geodetic_to_enu(lat, lon, alt, lat_ref, lon_ref, alt_ref) -> np.ndarray:
    x, y, z = geodetic_to_ecef(lat, lon, alt)
    return ecef_to_enu(x, y, z, lat_ref, lon_ref, alt_ref)


def enu_to_geodetic(e, n, u, lat_ref, lon_ref, alt_ref):
    xyz = enu_to_ecef(e, n, u, lat_ref, lon_ref, alt_ref)
    return ecef_to_geodetic(xyz[..., 0], xyz[..., 1], xyz[..., 2])


def enu_span_meters(lat_min, lat_max, lon_min, lon_max, lat_ref, lon_ref, h_ref):
    """N/E spans in meters of a lat/lon box around the ENU origin."""
    n1 = geodetic_to_enu(lat_min, lon_ref, h_ref, lat_ref, lon_ref, h_ref)[1]
    n2 = geodetic_to_enu(lat_max, lon_ref, h_ref, lat_ref, lon_ref, h_ref)[1]
    e1 = geodetic_to_enu(lat_ref, lon_min, h_ref, lat_ref, lon_ref, h_ref)[0]
    e2 = geodetic_to_enu(lat_ref, lon_max, h_ref, lat_ref, lon_ref, h_ref)[0]
    return abs(n2 - n1), abs(e2 - e1)


def choose_enu_origin(policy: str, lats, lons, alts, ordered_indices, custom=None):
    """ENU origin selection policy: first | mean | median | custom.

    custom: (lat, lon, alt) tuple required for the 'custom' policy.
    Returns (lat0, lon0, alt0, description).
    """
    policy = policy.lower()
    lats = np.asarray(lats)
    lons = np.asarray(lons)
    alts = np.asarray(alts)
    if policy == "first":
        i = ordered_indices[0]
        return float(lats[i]), float(lons[i]), float(alts[i]), "first camera (id-sorted)"
    if policy == "mean":
        return float(lats.mean()), float(lons.mean()), float(alts.mean()), "mean of all cameras"
    if policy == "median":
        return (
            float(np.median(lats)),
            float(np.median(lons)),
            float(np.median(alts)),
            "median of all cameras",
        )
    if policy == "custom":
        if custom is None or None in custom:
            raise ValueError("enu_ref=custom requires (lat, lon, alt)")
        return float(custom[0]), float(custom[1]), float(custom[2]), "custom coordinates"
    raise ValueError(f"Unknown enu_ref policy: {policy}")


def is_likely_ecef(C: np.ndarray) -> bool:
    """Heuristic: camera centers with ~Earth-radius norms are ECEF."""
    r = np.linalg.norm(np.asarray(C, dtype=np.float64), axis=1)
    return bool(r.mean() > 1e6 and r.std() < 5e5)
