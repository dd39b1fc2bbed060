from voxtral_tpu.runtime.stream import VoxStream, StreamConfig

__all__ = ["VoxStream", "StreamConfig"]
