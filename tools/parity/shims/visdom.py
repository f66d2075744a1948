"""visdom stand-in: the reference pushes plots to a visdom server
(``timit/steps/train_ctc.py:148-158``); headless runs only need the calls
to succeed and return a window handle.
"""


class Visdom:
    def __init__(self, *a, **k):
        pass

    def line(self, *a, **k):
        return "win"

    def heatmap(self, *a, **k):
        return "win"

    def image(self, *a, **k):
        return "win"
