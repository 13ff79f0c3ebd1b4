"""Config dictionaries with JSON persistence and per-key comments.

Capability parity with lib/param_dict.py:12-334: a plain-dict subclass whose
entries may carry comments, ``default-on-access`` reads, and JSON round-trip
(``save_dict_to_json`` / ``load_json_to_dict``).  Comments serialize under a
parallel ``__comments__`` key instead of the reference's inline scheme —
same capability, valid JSON.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

_COMMENTS_KEY = "__comments__"


class ParameterDict(dict):
    """A dict with optional per-key comments and default-on-access."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._comments: Dict[str, str] = {}

    def set(self, key: str, value: Any, comment: Optional[str] = None):
        self[key] = value
        if comment:
            self._comments[key] = comment
        return value

    def get_or_default(self, key: str, default: Any,
                       comment: Optional[str] = None) -> Any:
        """Return self[key], inserting (and persisting) the default when
        absent — the reference's default-on-access semantics
        (param_dict.py:142-210)."""
        if key not in self:
            self.set(key, default, comment)
        return self[key]

    def comment(self, key: str) -> Optional[str]:
        return self._comments.get(key)

    def to_json_obj(self) -> dict:
        obj = {k: v for k, v in self.items()}
        if self._comments:
            obj[_COMMENTS_KEY] = dict(self._comments)
        return obj

    @classmethod
    def from_json_obj(cls, obj: dict) -> "ParameterDict":
        comments = obj.pop(_COMMENTS_KEY, {})
        pd = cls(obj)
        pd._comments = dict(comments)
        return pd


def _jsonable(value):
    try:
        json.dumps(value)
        return value
    except TypeError:
        if hasattr(value, "tolist"):
            return value.tolist()
        return str(value)


def save_dict_to_json(d: dict, json_path: str) -> None:
    """Persist a config dict (tuples/arrays coerced to lists/strings)."""
    os.makedirs(os.path.dirname(json_path) or ".", exist_ok=True)
    if isinstance(d, ParameterDict):
        obj = d.to_json_obj()
    else:
        obj = dict(d)
    obj = {k: _jsonable(v) for k, v in obj.items()}
    with open(json_path, "w") as f:
        json.dump(obj, f, indent=2, sort_keys=True, default=str)


def load_json_to_dict(json_path: str) -> ParameterDict:
    with open(json_path) as f:
        obj = json.load(f)
    return ParameterDict.from_json_obj(obj)


# reference-spelling alias (lib/param_dict.py's ``load_jason_to_dict``,
# models/base.py:23)
load_jason_to_dict = load_json_to_dict
