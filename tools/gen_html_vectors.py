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
    # FileParser.read catches ANY parser exception (e.g. the AssertionError
    # html.parser raises for malformed/unknown marked sections) and returns
    # text '' (file_parser.py:218-221); the replaces then run on ''.
    try:
        p = TextEmu()
        p.feed(html)
        p.close()
        t = p.text()
    except Exception:
        t = ""
    t = t.replace("\n\n\n", "\n").replace("\n\n", "\n").replace("  ", " ")
    return t

def _main():
  pass

hand = [
    # basics
    "<html><body><p>Hello<b>World</b></p></body></html>",
    "<p>no separator</p><p>between paragraphs</p>",
    "plain text, no tags at all",
    "",
    # entities incl. legacy no-semicolon and numeric forms
    "a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;",
    "&amp no semicolon &ampx; &notit; &nbsp; end",
    "&#65;&#x42;&#67 &#x6a &#151; &#0; &#xD800; &#1114112; &#x10FFFF;",
    "&bogusentity; &x; & ; &#; &#x; &",
    "&aacute;&Aacute;&agrave;&ccedil;&ntilde;&ouml;&uuml;&szlig;&euro;&pound;&yen;",
    "&times;&divide;&plusmn;&le;&ge;&ne;&infin;&sum;&prod;&radic;&int;",
    "&alpha;&beta;&Gamma;&Delta;&omega;&Omega;&pi;&Pi;&theta;",
    "&hellip;&mdash;&ndash;&lsquo;&rsquo;&ldquo;&rdquo;&bull;&dagger;&Dagger;",
    "&CounterClockwiseContourIntegral; &NotSquareSupersetEqual; &fjlig;",
    # script/style/template exclusion
    "<script>var x = '<b>not text</b>';</script>visible",
    "<style>p { color: red; } /* <i>css</i> */</style>visible",
    "<SCRIPT TYPE='text/javascript'>alert('&amp; raw');</SCRIPT>after",
    "<script>unterminated to EOF",
    "<style>a</style\t >b",
    "<template>direct excluded<div>nested included</div>tail excluded</template>done",
    "before<script src='x.js'></script>after",
    # comments / decls / PIs / CDATA
    "<!-- a comment -->kept<!--multi\nline\ncomment-->also",
    "<!DOCTYPE html><p>doc</p>",
    "<?php echo 'hi'; ?>text<?xml version='1.0'?>more",
    "<![CDATA[ raw <b>cdata</b> ]]>outside",
    "<![if !IE]>conditional<![endif]>after",
    "<!-- unterminated comment",
    "<!unterminated decl",
    # marked-section close patterns are NAME-dependent (_markupbase):
    # CDATA-class needs ]]>, MS-conditionals close at ]>, unknown names or a
    # non-letter after <![ raise -> whole page yields ''
    "<![CDATA[x]>y]]>z",
    "<![CDATA[a ] ]  >b]] >c",
    "<![if IE]>ms conditional stops early]]>tail",
    "<![endif ]>after-endif",
    "<![rcdata[q]]>kept",
    "<![includeme]]>unknown keyword fails the page",
    "<![3]]>non-letter name fails the page",
    "<![ CDATA[x]]>space before name fails the page",
    "<![CDATA[unterminated to eof",
    "<![if unterminated to eof",
    # unterminated constructs at EOF re-enter parsing after the next '>'
    "<a href='x > y' unterminated <b>bold</b>",
    "<!doctype unterminated <p>para</p>",
    "<!-- unterminated comment <p>para</p>",
    "<? unterminated pi <p>para</p>",
    "</ unterminated endtag <p>para</p>",
    # malformed / tolerance
    "5 < 6 and 7 > 4",
    "a <1invalid> b",
    "bare < alone",
    "unclosed <b>bold",
    "wrong </nest>ing <div><b>x</wrong>y</div>z",
    "self closing <br/> and <img src='x'/> void <br> <hr>text",
    "attr quotes <a href='x > y' title=\"a > b\">link</a>end",
    "<a href=unquoted>u</a>",
    "<div   class = 'x'  id=y >spaces</div>",
    "</>empty endtag</ >ws endtag</123>numeric",
    "<div",
    "<div class='unterminated",
    "tag case <DIV>Upper</DIV><SpAn>mixed</sPaN>",
    # whitespace normalization interplay
    "line1\n\n\nline2\n\nline3  four   five",
    "a\n\n\n\nb",      # 4 newlines: replace('\n\n\n')->'\n\n' then ->'\n'
    "x    y",           # 4 spaces -> 2 -> ... single pass: '  '->' ' gives 2->1? '    '->'  ' (pass replaces both pairs)
    "<p>para1</p>\n\n<p>para2</p>",
    # unicode
    "<p>héllo wörld 你好 &#x4f60;&#x597d;</p>",
    "nbsp literal and &nbsp; entity",
    # textarea/title are NOT cdata in html.parser
    "<title>the <b>title</b></title><textarea>area &amp; stuff</textarea>",
]

# random generator: grammar-ish soup of the above constructs
rnd = random.Random(42)
WORDS = ["alpha","beta","gamma","delta","web","page","text","&amp;","&lt;","&#65;",
         "&hellip;","x<y","5<6",">7","été","你好"]
TAGS = ["div","p","span","b","i","a","ul","li","h1","table","tr","td"]
def rand_html(depth=0):
    parts = []
    for _ in range(rnd.randint(1, 6)):
        r = rnd.random()
        if r < 0.35:
            parts.append(rnd.choice(WORDS) + (" " if rnd.random() < 0.7 else ""))
        elif r < 0.6 and depth < 4:
            t = rnd.choice(TAGS)
            attrs = ""
            if rnd.random() < 0.4:
                attrs = f" class='c{rnd.randint(0,9)}'"
            inner = rand_html(depth + 1)
            if rnd.random() < 0.85:
                parts.append(f"<{t}{attrs}>{inner}</{t}>")
            else:
                parts.append(f"<{t}{attrs}>{inner}")  # unclosed
        elif r < 0.7:
            parts.append(f"<script>var a_{rnd.randint(0,99)} = 1 < 2;</script>")
        elif r < 0.78:
            parts.append(f"<style>.c{rnd.randint(0,9)} {{ margin: 0; }}</style>")
        elif r < 0.85:
            parts.append(f"<!-- c {rnd.randint(0,999)} -->")
        elif r < 0.92:
            parts.append("<br>" if rnd.random() < 0.5 else "<img src='i.png'>")
        else:
            parts.append("\n" * rnd.randint(1, 4))
    return "".join(parts)

if __name__ != "__main__":
    import sys as _s; _s.exit_ok=True
vectors = list(hand) + [rand_html() for _ in range(150)]
with open(sys.argv[1], "w") as f:
    for html in vectors:
        exp = extract(html)
        f.write(base64.b64encode(html.encode()).decode() + "\t"
                + base64.b64encode(exp.encode()).decode() + "\n")
print("wrote", len(vectors), "vectors")

# also unescape-only vectors against the real html.unescape
import html as H
un_vectors = [w for w in WORDS] + [
    "&amp;&amp&AMP;&AMP", "&Ampersand;", "&frac12;&frac34;&frac13;",
    "&#xZZ;", "&# 65;", "&abcdefghijklmnopqrstuvwxyzabcdefgh;", # >32 chars
    "&abcdefghijklmnopqrstuvwxyzabcdef;",  # exactly 32 + ;
    "&ampamp;", "&notin;", "&notinx;", "&curren;t", "&sup3;&sup1;&sup2;",
    "&#xd7ff;&#xd800;&#xdfff;&#xe000;", "&#x110000;&#x10ffff;",
    "&#128;&#129;&#130;&#159;&#160;", "&#11;&#12;&#13;&#14;&#1;&#0;",
    "mixed &gt&gt;&g;&gtt;", "&semi;&mid;&sol;",
]
for i in range(200):
    s = "".join(rnd.choice(["&", "#", ";", "x", "3", "a", "amp", "lt", "not",
                            "in", "q", " ", "<", "z", "9", "F", "\t"])
                for _ in range(rnd.randint(1, 24)))
    un_vectors.append(s)
with open(sys.argv[2], "w") as f:
    for s in un_vectors:
        f.write(base64.b64encode(s.encode()).decode() + "\t"
                + base64.b64encode(H.unescape(s).encode()).decode() + "\n")
print("wrote", len(un_vectors), "unescape vectors")
