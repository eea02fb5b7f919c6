#!/usr/bin/env python3
"""Cross-implementation test vectors for the non-HTML extraction arms.

Writes document binaries with INDEPENDENT writers (Python stdlib zipfile /
zlib — not the Scala DocGen code under test) plus the expected extraction
output, computed per the reference semantics (tools/file_parser.py in the
reference repo):
  - docx: stripped non-empty python-docx paragraphs + '\n' each, then the
    FileParser 3-pass whitespace normalize
  - pptx: a:t runs, paragraphs/slides joined '\n', then '\n'->' ' + normalize
  - csv/xlsx: REAL pandas dropna(axis=1).to_json(force_ascii=False) — pandas
    is the reference's actual dependency, so to_json rendering (int/float/
    bool/escape forms) is ground truth, not an emulation
  - pdf: documented pypdf-shaped semantics (lines joined '\n', trailing
    '\n' per page, pages concatenated bare) + normalize
  - epub: xhtml items joined '\n' -> soup.text, NO normalize (the reference
    keeps process_epub standalone)

Output: src/test/resources/docfiles/<name>.<ext> + <name>.expected.txt
Run from the repo root:  python3 tools/gen_doc_vectors.py
"""
import io
import json
import os
import zipfile
import zlib

import pandas as pd

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources",
                   "docfiles")
os.makedirs(OUT, exist_ok=True)


def normalize(text: str) -> str:
    # file_parser.py:224-226 — three literal passes
    text = text.replace("\n\n\n", "\n")
    text = text.replace("\n\n", "\n")
    text = text.replace("  ", " ")
    return text


def xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;").replace('"', "&quot;"))


def write(name: str, data: bytes, expected: str):
    with open(os.path.join(OUT, name), "wb") as f:
        f.write(data)
    with open(os.path.join(OUT, name + ".expected.txt"), "w",
              encoding="utf-8") as f:
        f.write(expected)
    print(f"{name}: {len(data)} bytes, expected {len(expected)} chars")


def make_zip(entries):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in entries:
            z.writestr(zipfile.ZipInfo(name, (2020, 1, 1, 0, 0, 0)),
                       data)
    return buf.getvalue()


# ---------------------------------------------------------------- docx
W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

paras = [
    "Hello world",
    "  padded  &  <escaped>  ",          # strips to 'padded  &  <escaped>'
    "",                                   # empty: skipped
    "tab\there",                          # w:tab element
    "line\nbreak",                        # w:br element
    "unicode é中文 ok",
    "   ",                                # whitespace-only: skipped
    "final&#9;entity",                    # literal text '&#9;' (escaped amp)
]


def docx_par(p):
    runs = []
    seg = ""
    def flush():
        nonlocal seg
        if seg:
            runs.append(f'<w:r><w:t xml:space="preserve">{xml_escape(seg)}</w:t></w:r>')
            seg = ""
    for c in p:
        if c == "\t":
            flush(); runs.append("<w:r><w:tab/></w:r>")
        elif c == "\n":
            flush(); runs.append("<w:r><w:br/></w:r>")
        else:
            seg += c
    flush()
    return f"<w:p>{''.join(runs)}</w:p>"


document = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<w:document xmlns:w="{W}"><w:body>'
            + "".join(docx_par(p) for p in paras)
            + "</w:body></w:document>")
docx_bytes = make_zip([
    ("[Content_Types].xml",
     '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
     '<Default Extension="xml" ContentType="application/xml"/>'
     '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
     '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>'),
    ("_rels/.rels",
     '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
     '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/></Relationships>'),
    ("word/document.xml", document),
])
# reference process_word: strip, skip empty, '\n' each; then read() normalize
word_text = ""
for p in paras:
    t = p.strip()
    if t:
        word_text += t + "\n"
write("vec1.docx", docx_bytes, normalize(word_text))

# ---------------------------------------------------------------- pptx
A = "http://schemas.openxmlformats.org/drawingml/2006/main"
P = "http://schemas.openxmlformats.org/presentationml/2006/main"
slides = [["Title slide", "with <two> paragraphs"], ["Second & last"]]
slide_entries = []
for i, sl in enumerate(slides):
    body = "".join(f"<a:p><a:r><a:t>{xml_escape(t)}</a:t></a:r></a:p>" for t in sl)
    slide_entries.append((f"ppt/slides/slide{i+1}.xml",
                          f'<?xml version="1.0"?><p:sld xmlns:a="{A}" xmlns:p="{P}">'
                          f"<p:cSld><p:spTree><p:sp><p:txBody>{body}</p:txBody></p:sp>"
                          f"</p:spTree></p:cSld></p:sld>"))
pptx_bytes = make_zip([
    ("[Content_Types].xml",
     '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
     '<Default Extension="xml" ContentType="application/xml"/></Types>'),
] + slide_entries)
ppt_text = "\n".join("\n".join(sl) for sl in slides)
write("vec1.pptx", pptx_bytes, normalize(ppt_text.replace("\n", " ")))

# ---------------------------------------------------------------- csv
csv_text = (
    "id,name,score,ratio,ok,partial\n"
    '1,"Quoted, comma",10,0.5,True,x\n'
    '2,"He said ""hi""",20,1.25,False,\n'
    "3,slash/path,30,2.5,True,y\n"
)
csv_bytes = csv_text.encode()
df = pd.read_csv(io.BytesIO(csv_bytes))
csv_expected = df.dropna(axis=1).to_json(force_ascii=False)
write("vec1.csv", csv_bytes, normalize(csv_expected))

# ---------------------------------------------------------------- xlsx
# Independent writer: INLINE strings (t=inlineStr) — a parser path the
# Scala DocGen (shared strings) does not emit. Expected via REAL pandas
# to_json over the same values.
S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
RNS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
header = ["city", "pop", "area", "note"]
data_rows = [
    [("inline", "Zürich"), ("num", "415367"), ("num", "87.88"), ("inline", "a/b")],
    [("inline", "Bern"), ("num", "133883"), ("num", "51.6"), (None, None)],
    [("inline", 'Basel "BS"'), ("num", "173863"), ("num", "23.85"), ("inline", "ok")],
]


def cell_xml(ref, kind, val):
    if kind == "inline":
        # split into two rich-text runs — pandas/openpyxl concatenate them
        mid = len(val) // 2
        return (f'<c r="{ref}" t="inlineStr"><is>'
                f'<r><t xml:space="preserve">{xml_escape(val[:mid])}</t></r>'
                f'<r><t xml:space="preserve">{xml_escape(val[mid:])}</t></r>'
                f'</is></c>')
    if kind == "num":
        return f'<c r="{ref}"><v>{val}</v></c>'
    return ""


rows_xml = []
all_rows = [[("inline", h) for h in header]] + data_rows
for ri, row in enumerate(all_rows):
    cells = []
    for ci, (kind, val) in enumerate(row):
        if kind is None:
            continue
        ref = chr(ord("A") + ci) + str(ri + 1)
        cells.append(cell_xml(ref, kind, val))
    rows_xml.append(f'<row r="{ri+1}">{"".join(cells)}</row>')
sheet = (f'<?xml version="1.0"?><worksheet xmlns="{S}"><sheetData>'
         + "".join(rows_xml) + "</sheetData></worksheet>")
xlsx_bytes = make_zip([
    ("[Content_Types].xml",
     '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
     '<Default Extension="xml" ContentType="application/xml"/>'
     '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/></Types>'),
    ("xl/workbook.xml",
     f'<?xml version="1.0"?><workbook xmlns="{S}" xmlns:r="{RNS}">'
     f'<sheets><sheet name="S1" sheetId="1" r:id="rId9"/></sheets></workbook>'),
    ("xl/_rels/workbook.xml.rels",
     '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
     f'<Relationship Id="rId9" Type="{RNS}/worksheet" Target="worksheets/wsA.xml"/></Relationships>'),
    ("xl/worksheets/wsA.xml", sheet),
])
# ground truth: same values through real pandas (openpyxl reads ints as int,
# decimals as float)
xdf = pd.DataFrame({
    "city": ["Zürich", "Bern", 'Basel "BS"'],
    "pop": [415367, 133883, 173863],
    "area": [87.88, 51.6, 23.85],
    "note": ["a/b", None, "ok"],
})
xlsx_expected = xdf.dropna(axis=1).to_json(force_ascii=False)
write("vec1.xlsx", xlsx_bytes, normalize(xlsx_expected))

# ---------------------------------------------------------------- pdf
def pdf_str(s: str) -> str:
    out = "("
    for c in s:
        if c in "()\\":
            out += "\\" + c
        elif ord(c) < 32 or ord(c) > 126:
            out += "\\%03o" % (ord(c) & 0xFF)
        else:
            out += c
    return out + ")"


def make_pdf(pages, compress):
    objs = {}
    n_pages = len(pages)
    font_id = 3 + 2 * n_pages
    kids = " ".join(f"{3+2*i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    for i, lines in enumerate(pages):
        page_id, cont_id = 3 + 2 * i, 4 + 2 * i
        objs[page_id] = (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                         f"/Resources << /Font << /F1 {font_id} 0 R >> >> "
                         f"/Contents {cont_id} 0 R >>").encode()
        ops = "BT\n/F1 12 Tf\n72 720 Td\n"
        for j, line in enumerate(lines):
            if j > 0:
                ops += "0 -14 TD\n"
            if j % 2 == 0:
                ops += pdf_str(line) + " Tj\n"
            else:
                # hex-string TJ arm: exercises <...> parsing
                hexed = line.encode("latin-1").hex()
                ops += f"[<{hexed}>] TJ\n"
        ops += "ET\n"
        data = ops.encode("latin-1")
        if compress:
            data = zlib.compress(data)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>\nstream\n".encode()
        else:
            head = f"<< /Length {len(data)} >>\nstream\n".encode()
        objs[cont_id] = head + data + b"\nendstream"
    objs[font_id] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = {}
    for oid in sorted(objs):
        offsets[oid] = out.tell()
        out.write(f"{oid} 0 obj\n".encode())
        out.write(objs[oid])
        out.write(b"\nendobj\n")
    xref_at = out.tell()
    out.write(f"xref\n0 {font_id+1}\n".encode())
    out.write(b"0000000000 65535 f \n")
    for oid in range(1, font_id + 1):
        out.write(("%010d 00000 n \n" % offsets[oid]).encode())
    out.write(f"trailer\n<< /Size {font_id+1} /Root 1 0 R >>\n"
              f"startxref\n{xref_at}\n%%EOF\n".encode())
    return out.getvalue()


pdf_pages = [
    ["First (page) line", "with \\backslash and)parens("],
    ["second page", "café latin-1 bytes"],
]
pdf_expected = normalize("".join("\n".join(ls) + "\n" for ls in pdf_pages))
write("vec1.pdf", make_pdf(pdf_pages, compress=True), pdf_expected)
write("vec2.pdf", make_pdf([["plain uncompressed", "two lines"]], compress=False),
      normalize("plain uncompressed\ntwo lines\n"))


def make_pdf_indirect_length(lines):
    ops = "BT\n/F1 12 Tf\n72 720 Td\n"
    for j, line in enumerate(lines):
        if j > 0:
            ops += "0 -14 TD\n"
        ops += pdf_str(line) + " Tj\n"
    ops += "ET\n"
    data = zlib.compress(ops.encode("latin-1"))
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 6 0 R >> >> /Contents 4 0 R >>"),
        4: b"<< /Length 5 0 R /Filter /FlateDecode >>\nstream\n" + data + b"\nendstream",
        5: str(len(data)).encode(),
        6: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = {}
    for oid in sorted(objs):
        offsets[oid] = out.tell()
        out.write(f"{oid} 0 obj\n".encode())
        out.write(objs[oid])
        out.write(b"\nendobj\n")
    xref_at = out.tell()
    out.write(b"xref\n0 7\n0000000000 65535 f \n")
    for oid in range(1, 7):
        out.write(("%010d 00000 n \n" % offsets[oid]).encode())
    out.write(f"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n".encode())
    return out.getvalue()


write("vec3.pdf", make_pdf_indirect_length(["indirect length", "fallback scan"]),
      normalize("indirect length\nfallback scan\n"))

# ---------------------------------------------------------------- epub
chapters = ["Chapter one text", "Chapter <2> & entities", "Final chapter"]
chapter_entries = [(f"OEBPS/c{i+1}.xhtml",
                    f"<html><body><p>{xml_escape(t)}</p></body></html>")
                   for i, t in enumerate(chapters)]
manifest = "".join(f'<item id="c{i+1}" href="c{i+1}.xhtml" media-type="application/xhtml+xml"/>'
                   for i in range(len(chapters)))
spine = "".join(f'<itemref idref="c{i+1}"/>' for i in range(len(chapters)))
opf = (f'<?xml version="1.0"?><package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
       f"<manifest>{manifest}</manifest><spine>{spine}</spine></package>")
container = ('<?xml version="1.0"?><container version="1.0" '
             'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
             '<rootfiles><rootfile full-path="OEBPS/content.opf" '
             'media-type="application/oebps-package+xml"/></rootfiles></container>')
epub_bytes = make_zip([
    ("mimetype", "application/epub+zip"),
    ("META-INF/container.xml", container),
    ("OEBPS/content.opf", opf),
] + chapter_entries)
# bs4 get_text over items joined '\n': chapter texts with '\n' between;
# NO normalize (process_epub is standalone)
epub_expected = "\n".join(chapters)
write("vec1.epub", epub_bytes, epub_expected)

print("done")

# ------------------------------------------------------------- csv fuzz
# 40 randomized tables (dtype mixes, missing cells, quoting/specials),
# expectations from REAL pandas — regenerates src/test/resources/docfiles/
# csv_fuzz.json consumed by FileParserSpec's fuzz loop.
import random

random.seed(42)
fuzz_words = ["alpha", "beta", "gamma", "x/y", 'q"t', "a,b", "path\\seg",
              "True", "zz"]


def _rand_cell(kind):
    if kind == "int":
        return str(random.randint(-9999, 9999))
    if kind == "float":
        return f"{random.uniform(-100,100):.2f}"
    if kind == "bool":
        return random.choice(["True", "False"])
    if kind == "word":
        return random.choice(fuzz_words)
    return ""


def _field(s):
    if any(ch in s for ch in ',"\n\r'):
        return '"' + s.replace('"', '""') + '"'
    return s


fuzz_cases = []
for _ in range(40):
    ncols = random.randint(2, 5)
    nrows = random.randint(1, 6)
    kinds = [random.choice(["int", "float", "bool", "word"])
             for _ in range(ncols)]
    header = [f"c{j}" for j in range(ncols)]
    rows = [["" if random.random() < 0.15 else _rand_cell(kinds[j])
             for j in range(ncols)] for _ in range(nrows)]
    fuzz_cases.append("\n".join(",".join(_field(c) for c in row)
                                for row in [header] + rows) + "\n")

# targeted raw-quote cases (r7): pandas' C parser honors the quote char only
# at FIELD START — a bare mid-field quote is literal content, and a lone
# quoted-empty line ("") is a one-NaN row, not a skipped blank line. These
# pin the Csv.records fix against real pandas.
fuzz_cases += [
    'a,b\nab"c,d\n',
    'a\n""\nzz\n',
    'c0,c1\n"x"tail,2\nab""cd,3\n',
]

fuzz_out = []
for text in fuzz_cases:
    fdf = pd.read_csv(io.BytesIO(text.encode()))
    fuzz_out.append({"csv": text,
                     "expected": fdf.dropna(axis=1).to_json(force_ascii=False)})
with open(os.path.join(OUT, "csv_fuzz.json"), "w") as f:
    json.dump(fuzz_out, f, indent=0)
print(f"csv_fuzz.json: {len(fuzz_out)} cases")
