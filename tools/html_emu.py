"""Generate extraction-parity vectors: html -> expected extracted text.

Tokenization comes from the REAL CPython html.parser (convert_charrefs=True);
on top we emulate the thin bs4>=4.9 layer that decides which data strings
`.text` includes (plain NavigableStrings only: not Script/Stylesheet,
not TemplateString, not comments/decls/PIs), plus bs4's void-element
auto-close and _popToTag stack behavior. Then the reference's three literal
replaces are applied.
"""
import base64, random, sys
from html.parser import HTMLParser

EMPTY = {"area","base","br","col","embed","hr","img","input","keygen","link",
         "menuitem","meta","param","source","track","wbr","basefont","bgsound",
         "command","frame","image","isindex","nextid","spacer"}

class TextEmu(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.stack = []
        self.out = []
    def handle_starttag(self, tag, attrs):
        if tag not in EMPTY:
            self.stack.append(tag)
    def handle_startendtag(self, tag, attrs):
        pass  # bs4 handles as empty element; never on stack
    def handle_endtag(self, tag):
        # bs4 _popToTag: pops while searching; unmatched empties the stack
        st = self.stack
        for i in range(len(st) - 1, -1, -1):
            if st[i] == tag:
                del st[i:]
                return
        del st[:]
    def handle_data(self, data):
        if self.stack and self.stack[-1] in ("script", "style", "template"):
            return
        self.out.append(data)
    # comments, decls, PIs, marked sections: excluded
    def text(self):
        return "".join(self.out)

def extract(html):
    p = TextEmu()
    p.feed(html)
    p.close()
    t = p.text()
    t = t.replace("\n\n\n", "\n").replace("\n\n", "\n").replace("  ", " ")
    return t

def _main():
  pass

