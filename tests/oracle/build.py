"""Build the differential-test oracle: reference C++ sim + shim -> liboracle.so.

Compiles the unmodified reference translation units straight out of
/root/reference/cpp (read-only mount; nothing is copied into this repo)
together with tests/oracle/shim.cpp. The renderer TUs are excluded; the
declaration-only Renderer.h is satisfied with -D_WIN32 (see shim.cpp).
"""
from __future__ import annotations

import pathlib
import subprocess

REFERENCE_CPP = pathlib.Path("/root/reference/cpp")
HERE = pathlib.Path(__file__).resolve().parent
BUILD_DIR = HERE / "build"
LIB = BUILD_DIR / "liboracle.so"

REFERENCE_SOURCES = [
    "Car.cpp",
    "RouteGen.cpp",
    "RoadMask.cpp",
    "LineMask.cpp",
    "Lidar.cpp",
    "IntersectionEnv.cpp",
    "TrafficFlow.cpp",
]


def reference_available() -> bool:
    return REFERENCE_CPP.is_dir() and all((REFERENCE_CPP / s).exists() for s in REFERENCE_SOURCES)


def build_oracle(force: bool = False) -> pathlib.Path:
    """Compile (once) and return the path to liboracle.so."""
    if not reference_available():
        raise FileNotFoundError(f"reference sources not found under {REFERENCE_CPP}")

    srcs = [str(REFERENCE_CPP / s) for s in REFERENCE_SOURCES] + [str(HERE / "shim.cpp")]
    if LIB.exists() and not force:
        newest = max(pathlib.Path(s).stat().st_mtime for s in srcs)
        if LIB.stat().st_mtime >= newest:
            return LIB

    BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O2", "-std=c++17", "-fPIC", "-shared",
        "-D_WIN32",  # neutralize the Windows-only guard in Renderer.h (decl-only)
        "-include", str(HERE / "compat.h"),  # MSVC implicit ::size_t
        f"-I{REFERENCE_CPP}",
        *srcs,
        "-o", str(LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB


if __name__ == "__main__":
    print(build_oracle(force=True))
