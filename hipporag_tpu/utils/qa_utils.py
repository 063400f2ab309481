"""IRCoT helpers (reference contract: utils/qa_utils.py:9-50)."""

from __future__ import annotations

from typing import List


def merge_elements_with_same_first_line(
    elements: List[str], prefix: str = "Wikipedia Title: "
) -> List[str]:
    """Merge passages that share a first line (title), joining bodies."""
    merged = {}
    order = []
    for element in elements:
        lines = element.split("\n", 1)
        title = lines[0]
        body = lines[1] if len(lines) > 1 else ""
        if title not in merged:
            merged[title] = body
            order.append(title)
        else:
            merged[title] = merged[title] + "\n" + body if merged[title] else body
    return [f"{t}\n{merged[t]}" if merged[t] else t for t in order]


def reason_step(dataset, prompt_template_manager, query: str, passages: List[str], thoughts: List[str], llm):
    """One IRCoT reasoning step: render passages + prior thoughts, get the next thought."""
    prompt_user = ""
    for passage in merge_elements_with_same_first_line(passages):
        prompt_user += f"Wikipedia Title: {passage}\n\n"
    prompt_user += f"Question: {query}\nThought: " + " ".join(thoughts)

    name = f"ircot_{dataset}"
    if not prompt_template_manager.is_template_name_valid(name):
        name = "ircot"
    messages = prompt_template_manager.render(name, prompt_user=prompt_user)
    response, _, _ = llm.infer(messages, response_format=None)
    return response.strip()
