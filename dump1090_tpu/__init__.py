"""dump1090-tpu: TPU-native Mode S / ADS-B demodulation framework.

Library quick start:

    from dump1090_tpu import decode_capture, decode_captures
    msgs = decode_capture("capture.bin", crcok_only=True)

CLI: `python -m dump1090_tpu --help` (all reference dump1090 flags).
"""

__version__ = "0.1.0"


def decode_capture(*args, **kwargs):
    from .api import decode_capture as f

    return f(*args, **kwargs)


def decode_captures(*args, **kwargs):
    from .api import decode_captures as f

    return f(*args, **kwargs)


def decode_capture_sharded(*args, **kwargs):
    from .api import decode_capture_sharded as f

    return f(*args, **kwargs)


__all__ = [
    "decode_capture",
    "decode_captures",
    "decode_capture_sharded",
    "__version__",
]
