"""Executor-side line tracer (imported automatically by every Python
process when this directory is on PYTHONPATH).

Gated on RAGFLOW_TRACE_OUT so normal runs are unaffected.  First-time
(file, line) hits inside ragflow_spark/ append one "path:line" record
to the output file (O_APPEND, line-buffered) — robust to Spark python
workers being SIGTERM'd without atexit.
"""

import os
import sys

_out_path = os.environ.get("RAGFLOW_TRACE_OUT")
_pkg = os.environ.get("RAGFLOW_TRACE_PKG", "/root/repo/ragflow_spark")

if _out_path:
    _seen = set()
    _fh = open(_out_path, "a", buffering=1)

    def _local(frame, event, arg):
        if event == "line":
            key = (frame.f_code.co_filename, frame.f_lineno)
            if key not in _seen:
                _seen.add(key)
                _fh.write(f"{key[0]}:{key[1]}\n")
        return _local

    def _global(frame, event, arg):
        if not frame.f_code.co_filename.startswith(_pkg):
            return None
        return _local if event == "call" else None

    sys.settrace(_global)
    import threading

    threading.settrace(_global)
