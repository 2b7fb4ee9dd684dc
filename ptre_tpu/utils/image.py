"""Image file IO (PPM/PNG/NPY) + framebuffer conversions.

Replaces the reference's D3D11 swap-chain presentation (`path_tracer.cu:
176-209`, `rasterizer.cu:136-153`) with file output: the interactive window is
out of scope, so frames are written to disk — which also fulfils the
reference's own planned "means to render sequences of frames" (README.txt).
"""

from __future__ import annotations

import os

import numpy as np


def write_ppm(path: str, rgb_u8) -> None:
    """Write a binary P6 PPM (the reference's leftover image.ppm format)."""
    arr = np.asarray(rgb_u8, np.uint8)
    assert arr.ndim == 3 and arr.shape[2] == 3, arr.shape
    h, w, _ = arr.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(arr.tobytes())


def read_ppm(path: str) -> np.ndarray:
    """Read a binary P6 PPM → (H, W, 3) uint8."""
    with open(path, "rb") as f:
        data = f.read()
    # header: magic, dims, maxval — whitespace/comment tolerant
    tokens = []
    i = 0
    while len(tokens) < 4:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    assert tokens[0] == b"P6", tokens[0]
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    assert maxval == 255, maxval
    i += 1  # single whitespace after maxval
    return np.frombuffer(data[i : i + w * h * 3], np.uint8).reshape(h, w, 3).copy()


def write_npy(path: str, arr) -> None:
    np.save(path, np.asarray(arr))


def write_image(path: str, rgb_u8) -> None:
    """Write by extension: .ppm native; .npy raw; .png via PIL if available."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".ppm":
        write_ppm(path, rgb_u8)
    elif ext == ".npy":
        write_npy(path, rgb_u8)
    elif ext == ".png":
        try:
            from PIL import Image  # optional dependency

            Image.fromarray(np.asarray(rgb_u8, np.uint8)).save(path)
        except ImportError:
            write_ppm(os.path.splitext(path)[0] + ".ppm", rgb_u8)
    else:
        raise ValueError(f"unsupported image extension: {path}")
