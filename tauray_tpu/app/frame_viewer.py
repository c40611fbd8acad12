"""Frame client run mode (reference: src/frame_client.cc — a thin SDL
viewer that needs no Vulkan or scene). Without a display here, received
frames are written to rolling PNG files (or a fixed path), which covers
remote-render-preview workflows from a workstation."""

from __future__ import annotations

import time

from ..log import TR_LOG
from ..net.frame_stream import FrameClient


def frame_client_viewer(opt) -> int:
    client = FrameClient(opt.connect)
    TR_LOG(f"frame client connected to {opt.connect}")
    prefix = opt.headless or "frame_client_view"
    count = 0
    t0 = time.perf_counter()
    try:
        while True:
            frame = client.recv_frame()
            if frame is None:
                TR_LOG("stream ended")
                break
            count += 1
            if count % 30 == 1:
                from PIL import Image
                Image.fromarray(frame, "RGB").save(f"{prefix}.png")
                fps = count / (time.perf_counter() - t0)
                TR_LOG(f"{count} frames ({fps:.1f} fps), "
                       f"latest saved to {prefix}.png")
    except KeyboardInterrupt:
        pass
    finally:
        client.close()
    return 0
