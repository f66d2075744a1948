"""editdistance stand-in for running the reference code in this image.

Plain Levenshtein DP with the same ``eval(a, b) -> int`` API as the
C++ extension the reference imports (``timit/models/model_ctc.py:7``).
"""


def eval(a, b):  # noqa: A001 - the upstream package exports this name
    a, b = list(a), list(b)
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, y in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (x != y))
        prev = cur
    return prev[len(b)]


def distance(a, b):
    return eval(a, b)
