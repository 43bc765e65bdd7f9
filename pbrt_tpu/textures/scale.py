"""Scale texture: tex1 * tex2 (pbrt-v3 §10.3.3)."""

from __future__ import annotations


class ScaleTexture:
    def __init__(self, tex1, tex2):
        self.tex1 = tex1
        self.tex2 = tex2

    def eval(self, si):
        a = self.tex1.eval(si)
        b = self.tex2.eval(si)
        if a.ndim != b.ndim:
            # broadcast float against spectrum
            if a.ndim < b.ndim:
                a = a[..., None]
            else:
                b = b[..., None]
        return a * b
