from .spec import CopyJob, JobSpec, SourceSpec, load_spec, spec_checksum  # noqa: F401
