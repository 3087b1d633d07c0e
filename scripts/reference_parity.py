#!/usr/bin/env python3
"""Reference-parity check: run the REFERENCE repo's own grammar-rule
and CYK implementations (TharunCodes07/Data-Curation-LLM, read-only at
/root/reference) on the corpus dumped by `graft.ParityDump`, and
assert the Scala engine produces IDENTICAL results.

The reference's heavy deps (nltk, google.generativeai, langchain,
loguru, yaml) are absent offline, so they are stubbed at the module
level; only the pure-python paths are exercised — exactly the paths
whose semantics the Scala engine claims to rebuild:
  - cfg_checker._apply_basic_rules / _apply_cfg_rules (+ basic bank)
  - cfg_checker._deduplicate_errors + position sort (check_text order)
  - cfg_generator CYK: base lexicon/grammar dicts (Python dup-key
    last-wins semantics come from Python itself here, validating the
    engine's "effective grammar" claim) + parse_sentence_cyk.

Usage: sbt "runMain graft.ParityDump /tmp/parity_scala.json"
       python3 scripts/reference_parity.py /tmp/parity_scala.json
Exit 0 on full agreement.
"""
import json
import sys
import types

# ---- stub the unavailable third-party modules BEFORE importing ----
def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m

class _Logger:
    def __getattr__(self, _):
        return lambda *a, **k: None

class _Config:
    def get(self, key, default=None):
        return default

nltk = _stub('nltk')
nltk.data = types.SimpleNamespace(find=lambda *a, **k: True)
nltk.download = lambda *a, **k: None
_stub('nltk.tokenize',
      sent_tokenize=lambda t: [s for s in t.split('.') if s.strip()],
      word_tokenize=lambda t: t.split())
_stub('nltk.tag', pos_tag=lambda toks: [(t, 'NN') for t in toks])
_stub('nltk.data', find=lambda *a, **k: True)
_stub('google', generativeai=None)
_stub('google.generativeai',
      configure=lambda **k: None,
      GenerativeModel=lambda *a, **k: types.SimpleNamespace())
_stub('src.config', config=_Config())
_stub('src.logger', app_logger=_Logger())
_stub('loguru', logger=_Logger())

sys.path.insert(0, '/root/reference')
# 'src' package must exist for 'src.grammar.*' relative imports
import importlib
src_pkg = types.ModuleType('src'); src_pkg.__path__ = ['/root/reference/src']
sys.modules.setdefault('src', src_pkg)
grammar_pkg = types.ModuleType('src.grammar')
grammar_pkg.__path__ = ['/root/reference/src/grammar']
sys.modules.setdefault('src.grammar', grammar_pkg)

req = _stub('requests', Session=lambda: types.SimpleNamespace(
    headers=types.SimpleNamespace(update=lambda *a, **k: None)))
req.__path__ = []  # mark as package so submodule stubs resolve
_stub('requests.adapters', HTTPAdapter=object)
_stub('urllib3', util=None)
sys.modules['urllib3'].__path__ = []
_stub('urllib3.util', retry=None)
sys.modules['urllib3.util'].__path__ = []
_stub('urllib3.util.retry', Retry=object)
_stub('bs4', BeautifulSoup=None, Comment=None)
_stub('src.scrapers')  # package marker
sys.modules['src.scrapers'].__path__ = ['/root/reference/src/scrapers']
_stub('src.utils')
sys.modules['src.utils'].__path__ = ['/root/reference/src/utils']

cg = importlib.import_module('src.grammar.cfg_generator')
cc = importlib.import_module('src.grammar.cfg_checker')
ws_mod = importlib.import_module('src.scrapers.web_scraper')
tc_mod = importlib.import_module('src.utils.text_chunker')

# reference checker, basic rules only (no API / no NLTK paths)
checker = cc.CFGGrammarChecker(use_api=False)

def ref_rule_hits(text):
    """check_text semantics minus the NLTK-only POS/CYK stages
    (cfg_checker.py:283-315): basic + bank rules, dedup, sort."""
    errors = checker._apply_basic_rules(text) + checker._apply_cfg_rules(text)
    unique = checker._deduplicate_errors(errors)
    unique.sort(key=lambda e: e.start_pos)
    return [
        {'rule_id': e.rule_id, 'start': e.start_pos, 'end': e.end_pos,
         'snippet': e.text_snippet, 'confidence': e.confidence,
         'context': e.context}
        for e in unique
    ]

# reference CYK system without the LLM constructor
cfg = cg.AdvancedCFGSystem.__new__(cg.AdvancedCFGSystem)
cfg.lexicon = {}
cfg.grammar = {}
cfg.initialize_base_lexicon()
cfg.initialize_base_grammar()

def main():
    dump = json.load(open(sys.argv[1] if len(sys.argv) > 1 else '/tmp/parity_scala.json'))
    failures = 0

    for entry in dump['texts']:
        text, got = entry['text'], entry['hits']
        exp = ref_rule_hits(text)
        if got != exp:
            failures += 1
            print(f"RULE MISMATCH on {text[:60]!r}:\n  reference: {exp}\n  engine:    {got}")

    for entry in dump['sentences']:
        s = entry['sentence']
        valid, reason = cfg.parse_sentence_cyk(s)
        if (entry['valid'], entry['reason']) != (valid, reason):
            failures += 1
            print(f"CYK MISMATCH on {s!r}: reference=({valid}, {reason!r}) "
                  f"engine=({entry['valid']}, {entry['reason']!r})")

    # _clean_text parity (web_scraper.py:67-103) — self-less call, the
    # method touches only `re`
    scraper = ws_mod.WebScraper.__new__(ws_mod.WebScraper)
    for entry in dump.get('clean', []):
        exp = ws_mod.WebScraper._clean_text(scraper, entry['text'])
        if entry['cleaned'] != exp:
            failures += 1
            print(f"CLEAN MISMATCH on {entry['text'][:50]!r}:\n"
                  f"  reference: {exp!r}\n  engine:    {entry['cleaned']!r}")

    # chunk_text parity (text_chunker.py:22-58)
    for entry in dump.get('chunk', []):
        chunker = tc_mod.TextChunker(chunk_size=entry['size'], overlap=entry['overlap'])
        exp = chunker.chunk_text(entry['text'])
        if entry['chunks'] != exp:
            failures += 1
            print(f"CHUNK MISMATCH on size={entry['size']} ov={entry['overlap']} "
                  f"{entry['text'][:40]!r}:\n  reference: {exp}\n  engine:    {entry['chunks']}")

    n = (len(dump['texts']) + len(dump['sentences']) +
         len(dump.get('clean', [])) + len(dump.get('chunk', [])))
    if failures:
        print(f"PARITY FAILED: {failures}/{n} mismatches")
        sys.exit(1)
    print(f"PARITY OK: {len(dump['texts'])} rule-texts + {len(dump['sentences'])} CYK "
          f"+ {len(dump.get('clean', []))} clean + {len(dump.get('chunk', []))} chunk "
          f"cases match the reference implementation exactly")

if __name__ == '__main__':
    main()
