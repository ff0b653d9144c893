from dorado_tpu.basecall.runner import BasecallRunner

__all__ = ["BasecallRunner"]
