"""Extract the GPT-judge prompt text from the reference eval scripts via AST.

The rubric prompts are the *definition* of the GPT-judged metrics (the scores
are prompt-sensitive), so hicom_tpu carries them verbatim. This helper parses
the reference source (read-only oracle) and renders the system/user message
contents with placeholder values so tests can assert string equality against
``hicom_tpu.eval.gpt_judge.build_messages`` — see
``tests/test_eval.py::test_gpt_judge_rubrics_verbatim``.

Reference sources: eval_video_oqa_vcgpt_{1..5}*.py, eval_video_oqa_activitynet.py,
eval_video_cap_msvc_{correctness,detailedness}.py (message construction inside
each file's ``annotate``; e.g. eval_video_oqa_vcgpt_1_correctness.py:50-76).
"""

from __future__ import annotations

import ast
import os

REFERENCE_EVAL_DIR = "/root/reference/hicom/eval/video"

# Placeholder values substituted for the reference f-string variables.
PLACEHOLDERS = {
    "question": "{question}",
    "answer": "{answer}",
    "pred": "{pred}",
    "question1": "{question1}",
    "question2": "{question2}",
    "pred1": "{pred1}",
    "pred2": "{pred2}",
}


def _render(node) -> str:
    """Render a str constant or f-string AST node with PLACEHOLDERS."""
    if isinstance(node, ast.Constant) and isinstance(node.value, str):
        return node.value
    if isinstance(node, ast.JoinedStr):
        out = []
        for part in node.values:
            if isinstance(part, ast.Constant):
                out.append(str(part.value))
            elif isinstance(part, ast.FormattedValue) and isinstance(part.value, ast.Name):
                out.append(PLACEHOLDERS[part.value.id])
            else:  # pragma: no cover - reference uses only simple names
                raise ValueError(f"unsupported f-string part: {ast.dump(part)}")
        return "".join(out)
    raise ValueError(f"unsupported content node: {ast.dump(node)}")


def extract_messages(filename: str) -> dict:
    """Return {'system': str, 'user': str} for a reference judge script."""
    path = os.path.join(REFERENCE_EVAL_DIR, filename)
    tree = ast.parse(open(path).read())
    found = {}
    for node in ast.walk(tree):
        if not isinstance(node, ast.Dict):
            continue
        keys = [k.value for k in node.keys if isinstance(k, ast.Constant)]
        if keys != ["role", "content"]:
            continue
        role = node.values[0].value
        if role in ("system", "user") and role not in found:
            found[role] = _render(node.values[1])
    if set(found) != {"system", "user"}:
        raise ValueError(f"could not locate system+user messages in {filename}")
    return found
