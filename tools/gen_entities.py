import html.entities, html as H

h5 = html.entities.html5
print(len(h5), 'entities')
inv_cr = H._invalid_charrefs
inv_cp = H._invalid_codepoints
print(len(inv_cr), 'invalid charrefs;', len(inv_cp), 'invalid codepoints')

RS = chr(0x1e)
US = chr(0x1f)

def esc(s):
    return ''.join(c if (32 <= ord(c) < 127 and c not in '"\\') else '\\u%04x' % ord(c) for c in s)

recs = [k + US + v for k, v in sorted(h5.items())]
chunks, cur, cln = [], [], 0
for rec in recs:
    r = rec + RS
    b = len(esc(r))
    if cln + b > 40000:
        chunks.append(''.join(cur)); cur, cln = [], 0
    cur.append(r); cln += b
if cur: chunks.append(''.join(cur))
print('chunks:', len(chunks))

lines = []
lines.append("package graft.extract")
lines.append("")
lines.append("/** HTML5 named character references + invalid charref tables, generated")
lines.append("  * from CPython's public `html.entities.html5` / `html._invalid_charrefs` /")
lines.append("  * `html._invalid_codepoints` (the data `html.unescape` uses, which is what")
lines.append("  * html.parser applies with convert_charrefs=True). Includes the legacy")
lines.append("  * no-trailing-semicolon forms. Do not edit by hand.")
lines.append("  */")
lines.append("object HtmlEntities {")
for i, ch in enumerate(chunks):
    lines.append(f'  private val packed{i}: String = "{esc(ch)}"')
alls = ' + '.join(f'packed{i}' for i in range(len(chunks)))
lines.append(f"  val html5: Map[String, String] = ({alls}).split('\\u001e').iterator.filter(_.nonEmpty).map {{ rec =>")
lines.append("    val i = rec.indexOf('\\u001f'); rec.substring(0, i) -> rec.substring(i + 1)")
lines.append("  }.toMap")
lines.append("")
inv_entries = ', '.join(f'0x{k:x} -> "{esc(v)}"' for k, v in sorted(inv_cr.items()))
lines.append(f"  val invalidCharrefs: Map[Int, String] = Map({inv_entries})")
cps = sorted(inv_cp)
lines.append(f"  val invalidCodepoints: Set[Int] = Set({', '.join('0x%x' % c for c in cps)})")
lines.append("}")
open('/root/repo/src/main/scala/graft/extract/HtmlEntities.scala', 'w').write('\n'.join(lines) + '\n')
print('written ok')
