"""ScanNet .sens binary parser + frame exporters.

Behavior parity with /root/reference/data/scannet/source_data/SensorData.py:
version-4 .sens layout (header: intrinsics/extrinsics for color+depth,
compression types, sizes, depth shift, frame count; per frame: c2w pose,
timestamps, jpeg color blob, zlib ushort depth blob). Exports color jpgs,
depth pngs, per-frame pose txts, and intrinsic txts with the same file layout
the loaders consume. Streaming: frames are parsed lazily instead of loading the
whole multi-GB .sens into RAM.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Iterator, Optional, Tuple

import numpy as np

COMPRESSION_TYPE_COLOR = {-1: "unknown", 0: "raw", 1: "png", 2: "jpeg"}
COMPRESSION_TYPE_DEPTH = {-1: "unknown", 0: "raw_ushort", 1: "zlib_ushort",
                          2: "occi_ushort"}


class SensorData:
    def __init__(self, filename: str):
        self.filename = filename
        with open(filename, "rb") as f:
            version = struct.unpack("I", f.read(4))[0]
            assert version == 4, f"unsupported .sens version {version}"
            strlen = struct.unpack("Q", f.read(8))[0]
            self.sensor_name = f.read(strlen)
            self.intrinsic_color = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
            self.extrinsic_color = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
            self.intrinsic_depth = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
            self.extrinsic_depth = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
            self.color_compression = COMPRESSION_TYPE_COLOR[
                struct.unpack("i", f.read(4))[0]]
            self.depth_compression = COMPRESSION_TYPE_DEPTH[
                struct.unpack("i", f.read(4))[0]]
            self.color_width = struct.unpack("I", f.read(4))[0]
            self.color_height = struct.unpack("I", f.read(4))[0]
            self.depth_width = struct.unpack("I", f.read(4))[0]
            self.depth_height = struct.unpack("I", f.read(4))[0]
            self.depth_shift = struct.unpack("f", f.read(4))[0]
            self.num_frames = struct.unpack("Q", f.read(8))[0]
            self._frames_offset = f.tell()

    def iter_frames(self, frame_skip: int = 1
                    ) -> Iterator[Tuple[int, np.ndarray, bytes, bytes]]:
        """Yields (index, c2w_pose [4,4], color_blob, depth_blob)."""
        with open(self.filename, "rb") as f:
            f.seek(self._frames_offset)
            for i in range(self.num_frames):
                pose = np.frombuffer(f.read(64), np.float32).reshape(4, 4)
                f.read(16)  # two uint64 timestamps
                color_sz = struct.unpack("Q", f.read(8))[0]
                depth_sz = struct.unpack("Q", f.read(8))[0]
                color = f.read(color_sz)
                depth = f.read(depth_sz)
                if i % frame_skip == 0:
                    yield i, pose, color, depth

    def decode_depth(self, blob: bytes) -> np.ndarray:
        assert self.depth_compression == "zlib_ushort", self.depth_compression
        raw = zlib.decompress(blob)
        return np.frombuffer(raw, np.uint16).reshape(self.depth_height,
                                                     self.depth_width)

    # --- exporters (same outputs as SensorData.py:72-112) ---

    def export_all(self, out_dir: str, frame_skip: int = 1,
                   image_size: Optional[Tuple[int, int]] = None):
        import cv2
        import imageio.v2 as imageio
        for sub in ("color", "depth", "pose"):
            os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
        for i, pose, color, depth_blob in self.iter_frames(frame_skip):
            assert self.color_compression == "jpeg", self.color_compression
            img = imageio.imread(color)
            depth = self.decode_depth(depth_blob)
            if image_size is not None:
                img = cv2.resize(img, (image_size[1], image_size[0]),
                                 interpolation=cv2.INTER_NEAREST)
                depth = cv2.resize(depth, (image_size[1], image_size[0]),
                                   interpolation=cv2.INTER_NEAREST)
            imageio.imwrite(os.path.join(out_dir, "color", f"{i}.jpg"), img)
            imageio.imwrite(os.path.join(out_dir, "depth", f"{i}.png"), depth)
            np.savetxt(os.path.join(out_dir, "pose", f"{i}.txt"), pose, fmt="%f")
        self.export_intrinsics(os.path.join(out_dir, "intrinsic"))

    def export_intrinsics(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        for name, mat in (("intrinsic_color", self.intrinsic_color),
                          ("extrinsic_color", self.extrinsic_color),
                          ("intrinsic_depth", self.intrinsic_depth),
                          ("extrinsic_depth", self.extrinsic_depth)):
            np.savetxt(os.path.join(out_dir, f"{name}.txt"), mat, fmt="%f")
