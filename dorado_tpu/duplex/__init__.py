from dorado_tpu.duplex.pairing import DuplexPairer, PairingResult
from dorado_tpu.duplex.stereo import StereoFeatureInputs, generate_stereo_features

__all__ = [
    "DuplexPairer",
    "PairingResult",
    "StereoFeatureInputs",
    "generate_stereo_features",
]
