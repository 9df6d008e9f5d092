from .extract_stream import extract_stream, run_stream_once  # noqa: F401
