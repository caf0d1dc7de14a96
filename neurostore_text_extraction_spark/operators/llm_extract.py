"""LLM prompt-extraction stage (U5/U6 + F7 in SURVEY.md §2.8).

Reference semantics re-expressed Spark-first (not copied):
- ``APIPromptExtractor._transform`` builds a chat prompt from a class
  ``_prompt`` Template plus the study text, escapes ``$`` as ``$$`` so
  ``string.Template`` treats document dollars literally
  (``ns_extract/pipelines/api.py:83-163``, escape at ``api.py:146-148``),
  sends it with a pydantic ``_extraction_schema`` and parses the
  model's structured reply; empty text short-circuits to ``{}``
  (``api.py:128-131``).
- ``ParticipantDemographicsExtractor`` / ``TaskExtractor`` are concrete
  prompt+schema pairs (``participant_demographics/model.py:14-89``,
  ``nv_task/model.py:8-13``).

Spark realization: one ``mapInPandas`` stage over (id, text) batches —
the client is created lazily once per python worker (O8), each row is
fault-isolated (O9: a bad reply sets ``error``/``valid`` instead of
failing the job), and batches are Arrow-sized by the session's
``maxRecordsPerBatch`` (O7). The client is *injected* — any object with
``complete(prompts: list[str]) -> list[str]`` returning JSON strings.
Offline/test runs use the deterministic :class:`StubLLMClient`; a real
OpenAI-compatible client drops into the same slot.
"""

import json
import re
from string import Template
from typing import Callable, Iterator, List, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# --- prompt machinery (F7) -------------------------------------------------

_SUFFIX = "\n Call the extractData function to save the output."


def escape_template_text(text: str) -> str:
    """``$`` → ``$$`` so string.Template leaves document dollars alone
    (F7, reference ``api.py:146-148``)."""
    return text.replace("$", "$$")


def render_prompt(template_str: str, text: str, **variables) -> str:
    """Two-stage prompt build mirroring the reference/publang flow:
    the escaped document text is embedded into the template body, then
    ``string.Template.substitute`` resolves remaining ``$variables``
    and folds ``$$`` back to ``$``. Without the escape a document
    containing ``$100`` would raise at substitute time."""
    body = template_str.replace("${text}", escape_template_text(text))
    return Template(body).substitute(**variables) + _SUFFIX


DEMOGRAPHICS_PROMPT = (
    "You will be provided with a text sample from a scientific journal. "
    "The sample is delimited with triple backticks. Identify groups of "
    "participants that participated in the study, and underlying "
    "characteristics of each group.\n\n```${text}```"
)

TASK_PROMPT = (
    "You will be provided with a text sample from a scientific journal. "
    "Extract the name of every behavioral task the participants "
    "performed.\n\n```${text}```"
)

GROUP_FIELDS = [
    T.StructField("group_name", T.StringType()),
    T.StructField("diagnosis", T.StringType()),
    T.StructField("count", T.IntegerType()),
    T.StructField("male_count", T.IntegerType()),
    T.StructField("female_count", T.IntegerType()),
]

DEMOGRAPHICS_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("raw_response", T.StringType()),
        T.StructField("groups", T.ArrayType(T.StructType(GROUP_FIELDS))),
        T.StructField("valid", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)

TASK_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("raw_response", T.StringType()),
        T.StructField("tasks", T.ArrayType(T.StringType())),
        T.StructField("valid", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)


# --- deterministic offline client ------------------------------------------

_GROUP_RE = re.compile(r"(\d+)\s+(patients|controls|participants)\b")
_TASK_RE = re.compile(r"performed the (\w[\w-]*) task\b")


class StubLLMClient:
    """Deterministic stand-in for the chat-completion client: parses
    the simple patterns a real model would extract, and replies with
    the same JSON shape. Exists so the whole stage (prompt build →
    batched call → JSON parse → schema validation) is exercised and
    SQL-oracle-able offline; swap in an OpenAI-compatible client for
    production."""

    def __init__(self, mode: str = "demographics"):
        self.mode = mode

    def complete(self, prompts: List[str]) -> List[str]:
        out = []
        for p in prompts:
            if self.mode == "demographics":
                groups = [
                    {"group_name": name, "count": int(n)}
                    for n, name in _GROUP_RE.findall(p)
                ]
                out.append(json.dumps({"groups": groups}))
            else:
                out.append(json.dumps({"tasks": _TASK_RE.findall(p)}))
        return out


class BrokenJSONClient:
    """Test client returning malformed replies — drives the O9 path."""

    def complete(self, prompts: List[str]) -> List[str]:
        return ["not json {" for _ in prompts]


# --- validation -------------------------------------------------------------


def _conform_group(g: dict) -> dict:
    """Coerce one group dict onto GROUP_FIELDS; raises on junk types
    (mirrors pydantic model_validate semantics: missing keys → None,
    wrong types → error)."""
    def _int(v):
        if v is None:
            return None
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise ValueError(f"not a number: {v!r}")
        return int(v)

    def _str(v):
        if v is None:
            return None
        if not isinstance(v, str):
            raise ValueError(f"not a string: {v!r}")
        return v

    return {
        "group_name": _str(g.get("group_name")),
        "diagnosis": _str(g.get("diagnosis")),
        "count": _int(g.get("count")),
        "male_count": _int(g.get("male_count")),
        "female_count": _int(g.get("female_count")),
    }


def _parse_demographics(raw: str) -> list:
    payload = json.loads(raw)
    if not isinstance(payload, dict) or not isinstance(payload.get("groups"), list):
        raise ValueError("reply missing 'groups' list")
    return [_conform_group(g) for g in payload["groups"]]


def _parse_tasks(raw: str) -> list:
    payload = json.loads(raw)
    if not isinstance(payload, dict) or not isinstance(payload.get("tasks"), list):
        raise ValueError("reply missing 'tasks' list")
    return [str(t) for t in payload["tasks"]]


_PARSERS = {"demographics": _parse_demographics, "tasks": _parse_tasks}


# --- the stage ---------------------------------------------------------------


def llm_extract(
    pages: DataFrame,
    client_factory: Callable[[], object],
    prompt_template: str = DEMOGRAPHICS_PROMPT,
    mode: str = "demographics",
    id_col: str = "url",
    text_col: str = "text",
    prompt_vars: Optional[dict] = None,
) -> DataFrame:
    """pages(id, text) → (id, raw_response, groups|tasks, valid, error).

    One Arrow-batched python stage; everything before and after stays
    JVM-side. ``client_factory`` is called once per python worker
    (lazy init, O8) so model/session state is reused across batches.
    Empty/null text short-circuits to an empty-but-valid row without a
    client call (P3, ``api.py:128-131``)."""
    payload_schema = (
        DEMOGRAPHICS_RESULT_SCHEMA if mode == "demographics" else TASK_RESULT_SCHEMA
    )
    list_field = "groups" if mode == "demographics" else "tasks"
    parser = _PARSERS[mode]
    variables = dict(prompt_vars or {})
    id_field = pages.schema[id_col]
    out_schema = T.StructType([id_field] + list(payload_schema.fields))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = None
        for pdf in batches:
            ids = pdf[id_col].tolist()
            texts = pdf[text_col].tolist()
            rows = {
                id_col: ids,
                "raw_response": [None] * len(ids),
                list_field: [None] * len(ids),
                "valid": [False] * len(ids),
                "error": [None] * len(ids),
            }
            todo = []
            for i, t in enumerate(texts):
                if t is None or not str(t).strip():
                    rows[list_field][i] = []
                    rows["valid"][i] = True
                else:
                    todo.append(i)
            if todo:
                if client is None:
                    client = client_factory()
                prompts = [
                    render_prompt(prompt_template, str(texts[i]), **variables)
                    for i in todo
                ]
                replies = client.complete(prompts)
                # a short (or long) reply list must not silently leave
                # unmatched rows as valid=False/error=None — those are
                # indistinguishable from never-attempted rows and O9
                # fault isolation loses the cause.
                if len(replies) != len(prompts):
                    mismatch = (
                        f"client returned {len(replies)} replies "
                        f"for {len(prompts)} prompts"
                    )
                    for i in todo[len(replies):]:
                        rows["error"][i] = mismatch
                for i, raw in zip(todo, replies):
                    rows["raw_response"][i] = raw
                    try:
                        rows[list_field][i] = parser(raw)
                        rows["valid"][i] = True
                    except Exception as exc:  # O9: row fault isolation
                        rows["error"][i] = f"{type(exc).__name__}: {exc}"
            yield pd.DataFrame(rows)

    return pages.select(id_col, text_col).mapInPandas(run, schema=out_schema)
