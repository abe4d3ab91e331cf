"""Mind-map extraction — the deterministic machinery of
``MindMapExtractor`` (/root/reference/graphrag/general/
mind_map_extractor.py:39-180) and its call site
(/root/reference/api/db/services/document_service.py:592-609).

The reference batches a document's chunks under an LLM token budget,
asks the model for a markdown mind map per batch, converts each
response with ``markdown_to_json.dictify`` + ``_todict``, reduces the
batch dicts with ``_merge``, and renders a root tree via
``_be_children``.  The LLM call is the seam; everything else is rules:

- ``dictify`` here is a from-scratch parser for the markdown outline
  grammar the mind-map prompt requests, matching the public
  markdown_to_json library's dict shape on that grammar: headings
  nest by level; bullet runs — unordered ``-``/``*``/``+`` AND
  ordered ``1.``/``1)`` markers — become lists where a deeper run
  rides as a NESTED LIST SIBLING after its parent item (the shape
  ``_list_to_kv`` pairs off); plain lines become string values.
  Code fences need no special casing here because the REFERENCE
  strips every fence marker line before calling dictify
  (mind_map_extractor.py:179 ``re.sub(r"```[^\n]*", "", response)``),
  so fence *content* is parsed as markdown by both pipelines.
  Library divergences kept, each pytest-pinned (test_mindmap):
  (a) a heading holding both plain content and deeper headings —
  markdown_to_json raises ContentError there (which the reference
  does not catch, dropping the whole batch); this parser stays total:
  an empty-content heading becomes the deeper headings' container,
  one with content keeps it and the deeper heading re-anchors at the
  enclosing container; (b) a multi-line paragraph renders as
  a list of lines here vs the library's softbreak-joined string;
  (c) setext headings are not recognized.  All three are outside the
  grammar the mind-map prompt requests.
- ``_list_to_kv`` (mind_map_extractor.py:141-153): every list value
  becomes a dict pairing each item with the FIRST element of the
  nested list that follows it — items not followed by a sublist are
  silently dropped, and a list with no sublists becomes {} (quirks
  kept).
- ``_merge`` (mind_map_extractor.py:128-139): reduce merges earlier
  batches INTO later ones — colliding scalars keep the EARLIER batch's
  value, colliding lists get the earlier items appended AFTER, and
  keys new to the later dict append after its own (so a merged
  document's children lead with the LAST batch's sections).  The
  reference reduces in trio-nursery completion order, which is
  nondeterministic; batch order here is section order (SURVEY §10.1
  adaptation, same as RAPTOR).
- ``_be_children`` / the root assembly (mind_map_extractor.py:61-77,
  103-125): ``\\*+`` stripped from keys, a keyset suppressing repeated
  dict keys across subtrees (leaf strings are exempt — the list branch
  only updates the set), the single-top-key root short-circuit.
- the batching fold (mind_map_extractor.py:88-101): budget
  ``max(max_length*0.8, max_length-512)``, flush BEFORE adding when
  the next section would cross it.
- the call site's gate: a rendered JSON under 32 chars raises, which
  the caller swallows — no mind-map row for that document.
"""

from __future__ import annotations

import re

from .tokens import num_tokens_from_string

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
# unordered (-, *, +) and ordered (1., 1)) list markers — CommonMark's
# list grammar as markdown_to_json's renderer flattens it; the marker
# and post-marker whitespace are captured because nesting depth is
# decided by the item's CONTENT column (see dictify)
_BULLET_RE = re.compile(r"^(\s*)([-*+]|\d{1,9}[.)])(\s+)(.*)$")
_FENCE_RE = re.compile(r"```[^\n]*")


def dictify(md: str) -> dict:
    """markdown_to_json.dictify for the outline subset (see module
    docstring): nested dict keyed by headings; a heading with deeper
    headings below it maps to their dict, a heading with bullet /
    plain-line content maps to that list / string directly; content
    before the first heading is outside the subset and dropped."""
    root: dict = {}
    stack: list[tuple[int, dict]] = [(0, root)]   # (level, container)
    # the innermost heading currently accepting content
    open_leaf: tuple[dict, str, int] | None = None
    bullets: list | None = None
    bullet_stack: list[list] = []
    text_lines: list[str] = []

    def flush_content() -> None:
        nonlocal open_leaf, bullets, bullet_stack, text_lines
        if open_leaf is not None:
            holder, key, _lv = open_leaf
            if bullets is not None:
                holder[key] = bullets
            elif text_lines:
                holder[key] = (text_lines[0] if len(text_lines) == 1
                               else list(text_lines))
            else:
                holder[key] = {}
            open_leaf = None
        bullets, bullet_stack, text_lines = None, [], []

    for line in md.split("\n"):
        h = _HEADING_RE.match(line)
        if h:
            level = len(h.group(1))
            title = h.group(2)
            if open_leaf is not None and open_leaf[2] < level \
                    and bullets is None and not text_lines:
                # the open heading becomes a container for this
                # deeper heading
                holder, key, lv = open_leaf
                node: dict = {}
                holder[key] = node
                stack.append((lv, node))
                open_leaf = None
            else:
                flush_content()
            while stack[-1][0] >= level and len(stack) > 1:
                stack.pop()
            open_leaf = (stack[-1][1], title, level)
            continue
        b = _BULLET_RE.match(line)
        if b and open_leaf is not None:
            # CommonMark-style nesting by CONTENT COLUMN (what
            # markdown_to_json's commonmark parser does): an item's
            # content column is marker start + marker width + the
            # spaces after it (>4 spaces count as 1, the CommonMark
            # rule), and a later marker nests iff it starts at or past
            # the previous item's content column — so '- ' children
            # need 2 columns but '1. ' children need 3.  The >=
            # content_col + 4 indented-code-block rule is out of the
            # outline grammar and not modelled (such lines nest one
            # level instead).  Clamp: a hostile response with
            # pathologically indented bullets must not build a
            # 10^4-deep nesting that later blows the recursive
            # todict/be_children walks.
            ind = len(b.group(1))
            wsp = len(b.group(3))
            ccol = ind + len(b.group(2)) + (wsp if wsp <= 4 else 1)
            item = b.group(4)
            if bullets is None:
                bullets = []
                bullet_stack = [bullets]
                mcols, ccols = [ind], [ccol]
            else:
                while len(bullet_stack) > 1 and ind < mcols[-1]:
                    bullet_stack.pop()
                    mcols.pop()
                    ccols.pop()
                if ind >= ccols[-1] and len(bullet_stack) <= 64:
                    cur = bullet_stack[-1]
                    if cur and isinstance(cur[-1], list):
                        sub = cur[-1]       # re-enter after a dedent
                    else:
                        sub = []
                        cur.append(sub)
                    bullet_stack.append(sub)
                    mcols.append(ind)
                    ccols.append(ccol)
                else:
                    ccols[-1] = ccol
            bullet_stack[-1].append(item)
            continue
        if line.strip() and open_leaf is not None and bullets is None:
            text_lines.append(line.strip())
        # blank lines and pre-heading text: no state change

    flush_content()
    return root


def _key(k: str) -> str:
    return re.sub(r"\*+", "", k)


def list_to_kv(data: dict) -> dict:
    """mind_map_extractor.py:141-153 transcription."""
    for key, value in data.items():
        if isinstance(value, dict):
            list_to_kv(value)
        elif isinstance(value, list):
            new_value = {}
            for i in range(len(value)):
                if isinstance(value[i], list) and i > 0:
                    # depth-jumping bullets make value[i-1] itself a
                    # list — the reference raises unhashable-key
                    # there; degrade by skipping the malformed pair
                    if isinstance(value[i - 1], str):
                        new_value[value[i - 1]] = value[i][0]
            data[key] = new_value
        else:
            continue
    return data


def todict(layer) -> dict:
    """mind_map_extractor.py:155-166: OrderedDict -> dict walk, then
    the list->kv fold."""
    to_ret = dict(layer) if isinstance(layer, dict) else layer
    try:
        for key, value in to_ret.items():
            to_ret[key] = todict(value)
    except AttributeError:
        pass
    return list_to_kv(to_ret)


def merge(d1: dict, d2: dict) -> dict:
    """mind_map_extractor.py:128-139 ``_merge`` — merges d1 INTO d2
    (earlier batch into later), quirks kept."""
    for k in d1:
        if k in d2:
            if isinstance(d1[k], dict) and isinstance(d2[k], dict):
                merge(d1[k], d2[k])
            elif isinstance(d1[k], list) and isinstance(d2[k], list):
                d2[k].extend(d1[k])
            else:
                d2[k] = d1[k]
        else:
            d2[k] = d1[k]
    return d2


def be_children(obj, keyset: set) -> list:
    """mind_map_extractor.py:61-77 transcription."""
    if isinstance(obj, str):
        obj = [obj]
    if isinstance(obj, list):
        # nested lists reach here only through malformed depth jumps,
        # where the reference crashes on keyset.update (unhashable);
        # degrade by keeping the string items
        obj = [i for i in obj if isinstance(i, str)]
        keyset.update(obj)
        obj = [re.sub(r"\*+", "", i) for i in obj]
        return [{"id": i, "children": []} for i in obj if i]
    arr = []
    for k, v in obj.items():
        k = _key(k)
        if k and k not in keyset:
            keyset.add(k)
            arr.append({"id": k, "children": be_children(v, keyset)})
    return arr


def assemble_tree(batch_dicts: list[dict]) -> dict:
    """The __call__ tail (mind_map_extractor.py:103-125): reduce-merge
    the per-batch dicts (in batch order — the determinization), then
    the root wrap with the single-top-key short-circuit."""
    from functools import reduce

    if not batch_dicts:
        return {"id": "root", "children": []}
    merge_json = reduce(merge, batch_dicts)
    if len(merge_json) > 1:
        keys = [re.sub(r"\*+", "", k) for k, v in merge_json.items()
                if isinstance(v, dict)]
        keyset = set(i for i in keys if i)
        return {
            "id": "root",
            "children": [
                {"id": _key(k), "children": be_children(v, keyset)}
                for k, v in merge_json.items()
                if isinstance(v, dict) and _key(k)
            ],
        }
    k = _key(list(merge_json.keys())[0])
    return {"id": k,
            "children": be_children(list(merge_json.items())[0][1],
                                    {k})}


def batch_sections(sections: list[str], max_length: int) -> list[str]:
    """The token-budget fold (mind_map_extractor.py:88-101): returns
    the joined text of each LLM batch, flushing BEFORE adding a
    section that would cross ``max(0.8*max_length, max_length-512)``."""
    token_count = max(max_length * 0.8, max_length - 512)
    batches: list[str] = []
    texts: list[str] = []
    cnt = 0
    for section in sections:
        section_cnt = num_tokens_from_string(section)
        if cnt + section_cnt >= token_count and texts:
            batches.append("".join(texts))
            texts = []
            cnt = 0
        texts.append(section)
        cnt += section_cnt
    if texts:
        batches.append("".join(texts))
    return batches


def response_to_dict(response: str) -> dict:
    """_process_document's post-LLM path (mind_map_extractor.py:
    168-180): strip code fences, dictify, todict."""
    return todict(dictify(_FENCE_RE.sub("", response)))


def render_mind_map(tree: dict) -> str:
    """The call-site rendering (document_service.py:597):
    json.dumps(..., ensure_ascii=False, indent=2)."""
    import json

    return json.dumps(tree, ensure_ascii=False, indent=2)
