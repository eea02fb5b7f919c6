import base64, sys
sys.path.insert(0, '/tmp')
from html_emu import extract  # real stdlib html.parser + bs4-layer emu

ok = bad = 0
for line in open(sys.argv[1]):
    h, got = line.rstrip('\n').split('\t')
    html = base64.b64decode(h).decode()
    got_text = base64.b64decode(got).decode()
    want = extract(html)
    if want == got_text:
        ok += 1
    else:
        bad += 1
        if bad <= 3:
            print('MISMATCH html[:120]:', html[:120].replace('\n', '\\n'))
            print('  GOT :', got_text[:150].replace('\n', '\\n'))
            print('  WANT:', want[:150].replace('\n', '\\n'))
print(f'{ok} OK, {bad} mismatches')
sys.exit(1 if bad else 0)
