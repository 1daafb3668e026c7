"""T9 — the reference's XOR demo (main.c:23-157), per-sample semantics.

A 2-4-1 network: leaky-ReLU(0.01) hidden layer, **sigmoid** output (the
O==1 branch of forward_pass, network.c:255-259 — M5), trained with the
reference's per-sample Adam ``back_propagation`` (network.c:268-371):
delta_output = output - goal (the sigmoid+BCE combined gradient takes
the same form as softmax+CE), hidden delta through dRelu, one Adam step
per SAMPLE with running beta^t products, Fisher-Yates epoch shuffle of
the 4 rows (tools.c:331-341), 10000 epochs (main.c:76).

This is the miniature where the reference's per-sample T4 update
granularity is reproduced exactly (the OCR fixture trainer batches it —
documented deviation in trainer.py); a unit test trains it to
convergence.  Dropout off (rate 0 unless set), matching
InitializeNetwork's default for the XOR path.
"""

from __future__ import annotations

import numpy as np

ADAM_BETA1, ADAM_BETA2, ADAM_EPS = 0.9, 0.999, 1e-8  # common.h:13-15

XOR_INPUTS = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
XOR_TARGETS = np.array([0.0, 1.0, 1.0, 0.0])


def sigmoid(x):
    """M5 (tools.c:144-147)."""
    return 1.0 / (1.0 + np.exp(-x))


class XorNet:
    """2-4-1 net with the reference's per-sample Adam update."""

    def __init__(self, seed: int = 7, eta: float = 0.01):
        rng = np.random.default_rng(seed)
        # He-uniform like InitializeNetwork's fresh init (tools.c:195-207)
        self.w1 = rng.uniform(-np.sqrt(6.0 / 2), np.sqrt(6.0 / 2), (2, 4))
        self.b1 = np.zeros(4)
        self.w2 = rng.uniform(-np.sqrt(6.0 / 4), np.sqrt(6.0 / 4), (4, 1))
        self.b2 = np.zeros(1)
        self.eta = eta
        self.params = [self.w1, self.b1, self.w2, self.b2]
        self.m = [np.zeros_like(p) for p in self.params]
        self.v = [np.zeros_like(p) for p in self.params]
        self.t = 0
        self.b1t = self.b2t = 1.0
        self.rng = rng

    def forward(self, x: np.ndarray):
        pre = x @ self.w1 + self.b1
        hid = np.where(pre > 0, pre, 0.01 * pre)  # leaky relu tools.c:154-158
        out = sigmoid(hid @ self.w2 + self.b2)  # O==1 branch network.c:255-259
        return pre, hid, out

    def train_step(self, x: np.ndarray, goal: float) -> None:
        """One per-sample forward + back_propagation (network.c:268-371)."""
        pre, hid, out = self.forward(x)
        delta_out = out - goal  # network.c:284-285
        dw2 = np.outer(hid, delta_out)
        db2 = delta_out
        delta_hid = (self.w2 @ delta_out) * np.where(pre > 0, 1.0, 0.01)
        dw1 = np.outer(x, delta_hid)
        db1 = delta_hid

        self.t += 1
        self.b1t *= ADAM_BETA1
        self.b2t *= ADAM_BETA2
        for p, g, mi, vi in zip(self.params, [dw1, db1, dw2, db2], self.m, self.v):
            mi *= ADAM_BETA1
            mi += (1 - ADAM_BETA1) * g
            vi *= ADAM_BETA2
            vi += (1 - ADAM_BETA2) * g * g
            p -= self.eta * (mi / (1 - self.b1t)) / (
                np.sqrt(vi / (1 - self.b2t)) + ADAM_EPS
            )

    def predict(self) -> np.ndarray:
        return np.array([float(self.forward(x)[2][0]) for x in XOR_INPUTS])


def train_xor(seed: int = 7, epochs: int = 10000) -> XorNet:
    """The main.c training loop: per epoch, shuffle the 4 rows and take
    one per-sample Adam step each (main.c:76-104)."""
    net = XorNet(seed)
    order = np.arange(4)
    for _ in range(epochs):
        net.rng.shuffle(order)  # Fisher-Yates analog (tools.c:331-341)
        for i in order:
            net.train_step(XOR_INPUTS[i], XOR_TARGETS[i])
    return net
