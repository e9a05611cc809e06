from emr2a_tpu.data.manifest import load_manifest

__all__ = ["load_manifest"]
