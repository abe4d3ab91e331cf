"""Recursive JSON splitter with max/min serialized-chunk budgets.

Behavioral equivalent of RAGFlowJsonParser
(/root/reference/deepdoc/parser/json_parser.py:25-133): lists convert to
index-keyed dicts, then a depth-first walk packs subtrees into chunks of
at most ``2*max_chunk_size`` serialized chars, starting a new chunk only
once the current one exceeds ``min_chunk_size`` (reference quirks kept:
the doubled max in ``__init__``, the strict ``<`` on remaining space,
single scalars overwriting into the current chunk regardless of size).
"""

from __future__ import annotations

import json
from typing import Any

from .codec import decode_blob


def _json_size(data: dict) -> int:
    return len(json.dumps(data, ensure_ascii=False))


def _set_nested(d: dict, path: list[str], value: Any) -> None:
    for key in path[:-1]:
        d = d.setdefault(key, {})
    d[path[-1]] = value


def _lists_to_dicts(data: Any) -> Any:
    if isinstance(data, dict):
        return {k: _lists_to_dicts(v) for k, v in data.items()}
    if isinstance(data, list):
        return {str(i): _lists_to_dicts(v) for i, v in enumerate(data)}
    return data


def split_json(json_data: Any, max_chunk_size: int = 2000,
               min_chunk_size: int | None = None,
               convert_lists: bool = True) -> list[dict]:
    max_size = max_chunk_size * 2
    min_size = (min_chunk_size if min_chunk_size is not None
                else max(max_chunk_size - 200, 50))

    def walk(data: Any, path: list[str], chunks: list[dict]) -> list[dict]:
        if isinstance(data, dict):
            for key, value in data.items():
                new_path = path + [key]
                remaining = max_size - _json_size(chunks[-1])
                if _json_size({key: value}) < remaining:
                    _set_nested(chunks[-1], new_path, value)
                else:
                    if _json_size(chunks[-1]) >= min_size:
                        chunks.append({})
                    walk(value, new_path, chunks)
        else:
            _set_nested(chunks[-1], path, data)
        return chunks

    data = _lists_to_dicts(json_data) if convert_lists else json_data
    chunks = walk(data, [], [{}])
    if not chunks[-1]:
        chunks.pop()
    return chunks


def json_sections(binary: bytes, max_chunk_size: int = 2000) -> list[str]:
    """binary -> serialized chunk strings (json_parser.py:37-43)."""
    txt = decode_blob(binary)
    try:
        data = json.loads(txt)
    except json.JSONDecodeError:
        return []
    return [json.dumps(c, ensure_ascii=False)
            for c in split_json(data, max_chunk_size) if c]
