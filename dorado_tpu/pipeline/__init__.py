from dorado_tpu.pipeline.basecaller import BasecallerPipeline, PipelineStats

__all__ = ["BasecallerPipeline", "PipelineStats"]
