"""Chunker tests: structural scanning across languages, gaps, splitting, dedup.

Mirrors the reference's chunker unit tests (chunker/semantic.rs:489-684) plus
extra per-language coverage for the structural scanner.
"""

import textwrap

from codesearch_tpu.chunker import Chunk, ChunkDeduplicator, ChunkKind, SemanticChunker
from codesearch_tpu.chunker.lexer import mask_c_family, mask_python, mask_source
from codesearch_tpu.fileio.language import Language


def chunks_of(lang, path, code, **kw):
    return SemanticChunker(**kw).chunk_semantic(lang, path, code)


class TestLexer:
    def test_masks_strings_and_comments(self):
        src = 'fn f() { let s = "a { b }"; } // brace }\n'
        masked = mask_c_family(src, lifetimes=True)
        assert masked.count("{") == 1
        assert masked.count("}") == 1
        assert len(masked) == len(src)

    def test_rust_raw_string(self):
        src = 'let s = r#"hello "x" { } "#; fn g() {}'
        masked = mask_source("rust", src)
        assert masked.count("{") == 1

    def test_rust_lifetime_not_char(self):
        src = "fn f<'a>(x: &'a str) {}"
        masked = mask_source("rust", src)
        assert "fn f" in masked
        assert "{}" in masked

    def test_python_triple_quote(self):
        src = 'def f():\n    """doc { with brace"""\n    return 1\n'
        masked = mask_python(src)
        assert "{" not in masked
        assert "def f" in masked

    def test_go_backtick(self):
        src = 'var s = `raw { string`\nfunc main() {}\n'
        masked = mask_source("go", src)
        assert masked.count("{") == 1

    def test_ts_template_literal(self):
        src = "const s = `hi ${name} {`; function f() {}"
        masked = mask_source("ts", src)
        assert masked.count("{") == 1


RUST_CODE = '''
/// This is a doc comment
fn hello_world() {
    println!("Hello, world!");
}

fn add(a: i32, b: i32) -> i32 {
    a + b
}

struct Point {
    x: f64,
    y: f64,
}
'''


class TestRustChunking:
    def test_chunk_rust_code(self):
        chunks = chunks_of(Language.RUST, "test.rs", RUST_CODE)
        fns = [c for c in chunks if c.kind is ChunkKind.FUNCTION]
        assert len(fns) >= 2
        hello = next(c for c in fns if "hello_world" in c.content)
        assert hello.signature and "fn hello_world" in hello.signature
        assert hello.docstring and "doc comment" in hello.docstring
        structs = [c for c in chunks if c.kind is ChunkKind.STRUCT]
        assert len(structs) == 1 and structs[0].signature.startswith("struct Point")

    def test_context_breadcrumbs_impl(self):
        code = '''
impl MyStruct {
    fn method(&self) {
        println!("method");
    }
}
'''
        chunks = chunks_of(Language.RUST, "test.rs", code)
        method = next(c for c in chunks if c.kind is ChunkKind.METHOD)
        assert method.context[0].startswith("File:")
        assert any("Impl" in c for c in method.context)
        impl = next(c for c in chunks if c.kind is ChunkKind.IMPL)
        assert impl.start_line < method.start_line

    def test_trait_and_enum_and_alias(self):
        code = '''
pub trait Runner {
    fn run(&self) -> bool;
}

pub enum Mode { Fast, Slow }

pub type Alias = Vec<u8>;

pub const LIMIT: usize = 10;

pub static NAME: &str = "x";
'''
        chunks = chunks_of(Language.RUST, "t.rs", code)
        kinds = {c.kind for c in chunks}
        assert ChunkKind.TRAIT in kinds
        assert ChunkKind.ENUM in kinds
        assert ChunkKind.TYPE_ALIAS in kinds
        assert ChunkKind.CONST in kinds
        assert ChunkKind.STATIC in kinds
        # trait method declaration (ends with ';') nested in trait
        m = next(c for c in chunks if c.kind is ChunkKind.METHOD)
        assert "fn run" in m.signature

    def test_attributes_covered(self):
        code = '''
#[derive(Debug, Clone)]
pub struct Config {
    pub name: String,
}
'''
        chunks = chunks_of(Language.RUST, "t.rs", code)
        # the attribute line should NOT appear as a gap chunk
        gap_contents = [c.content for c in chunks if c.kind is ChunkKind.BLOCK]
        assert not any("#[derive" in g for g in gap_contents)

    def test_module_docs_gap(self):
        # One contiguous uncovered region starting with //! classifies as
        # ModuleDocs (classification precedence mirrors semantic.rs:443-487).
        code = '''//! Module documentation.
//! More docs.

use std::path::Path;
use std::fs;

fn work() {}
'''
        chunks = chunks_of(Language.RUST, "t.rs", code)
        kinds = [c.kind for c in chunks]
        assert ChunkKind.MODULE_DOCS in kinds
        assert ChunkKind.FUNCTION in kinds

    def test_imports_gap(self):
        code = '''use std::path::Path;
use std::fs;
use std::io;

fn work() {}
'''
        chunks = chunks_of(Language.RUST, "t.rs", code)
        kinds = [c.kind for c in chunks]
        assert ChunkKind.IMPORTS in kinds


PY_CODE = '''
def hello():
    """Say hello"""
    print("Hello!")

class Calculator:
    """A simple calculator"""

    def add(self, a, b):
        """Add two numbers"""
        return a + b
'''


class TestPythonChunking:
    def test_chunk_python_code(self):
        chunks = chunks_of(Language.PYTHON, "test.py", PY_CODE)
        assert len(chunks) >= 2
        withdocs = [c for c in chunks if c.docstring]
        assert withdocs, "should extract docstrings"
        hello = next(c for c in chunks if c.kind is ChunkKind.FUNCTION)
        assert hello.docstring == "Say hello"
        cls = next(c for c in chunks if c.kind is ChunkKind.CLASS)
        assert cls.docstring == "A simple calculator"
        method = next(c for c in chunks if c.kind is ChunkKind.METHOD)
        assert method.docstring == "Add two numbers"
        assert any("Class: Calculator" in x for x in method.context)

    def test_decorators_covered(self):
        code = '''
@app.route("/x")
def handler():
    return 1
'''
        chunks = chunks_of(Language.PYTHON, "t.py", code)
        gaps = [c for c in chunks if c.kind not in (ChunkKind.FUNCTION,)]
        assert not any("@app.route" in c.content for c in gaps)

    def test_nested_function(self):
        code = '''
def outer():
    def inner():
        return 2
    return inner
'''
        chunks = chunks_of(Language.PYTHON, "t.py", code)
        names = [c.context[-1] for c in chunks if c.kind is ChunkKind.FUNCTION]
        assert "Function: outer" in names
        assert "Function: inner" in names

    def test_multiline_signature(self):
        code = '''
def long_fn(
    a: int,
    b: str = "x",
) -> bool:
    return True
'''
        chunks = chunks_of(Language.PYTHON, "t.py", code)
        fn = next(c for c in chunks if c.kind is ChunkKind.FUNCTION)
        assert fn.end_line >= 5
        assert "long_fn" in fn.signature


class TestOtherLanguages:
    def test_go(self):
        code = '''
package main

type Server struct {
    Addr string
}

type Handler interface {
    Serve() error
}

func (s *Server) Start() error {
    return nil
}

func main() {
    fmt.Println("hi")
}
'''
        chunks = chunks_of(Language.GO, "main.go", code)
        kinds = {c.kind for c in chunks}
        assert ChunkKind.STRUCT in kinds
        assert ChunkKind.INTERFACE in kinds
        assert ChunkKind.METHOD in kinds
        assert ChunkKind.FUNCTION in kinds
        start = next(c for c in chunks if c.kind is ChunkKind.METHOD)
        assert start.signature.startswith("func (s *Server) Start")

    def test_typescript(self):
        code = '''
export interface Props {
    name: string;
}

export class Widget {
    render(): string {
        return "x";
    }
}

export function build(props: Props): Widget {
    return new Widget();
}

export const compute = (x: number): number => {
    return x * 2;
};

type Alias = string | number;
'''
        chunks = chunks_of(Language.TYPESCRIPT, "w.ts", code)
        kinds = {c.kind for c in chunks}
        assert ChunkKind.INTERFACE in kinds
        assert ChunkKind.CLASS in kinds
        assert ChunkKind.FUNCTION in kinds
        assert ChunkKind.METHOD in kinds
        assert ChunkKind.TYPE_ALIAS in kinds
        arrow = [c for c in chunks if c.kind is ChunkKind.FUNCTION and "compute" in (c.signature or "")]
        assert arrow

    def test_c(self):
        code = '''
#include <stdio.h>

struct point {
    int x;
    int y;
};

static int add(int a, int b) {
    return a + b;
}

int main(void)
{
    return add(1, 2);
}
'''
        chunks = chunks_of(Language.C, "m.c", code)
        kinds = {c.kind for c in chunks}
        assert ChunkKind.STRUCT in kinds
        fns = [c for c in chunks if c.kind is ChunkKind.FUNCTION]
        names = " ".join(c.signature or "" for c in fns)
        assert "add" in names and "main" in names

    def test_cpp(self):
        code = '''
namespace app {

class Engine {
public:
    Engine() : started_(false) {}
    void start() {
        started_ = true;
    }
private:
    bool started_;
};

}  // namespace app

int run(app::Engine& e) {
    e.start();
    return 0;
}
'''
        chunks = chunks_of(Language.CPP, "e.cpp", code)
        kinds = {c.kind for c in chunks}
        assert ChunkKind.MOD in kinds  # namespace
        assert ChunkKind.CLASS in kinds
        assert ChunkKind.METHOD in kinds
        assert ChunkKind.FUNCTION in kinds

    def test_java(self):
        code = '''
public class Service {
    private final String name;

    public Service(String name) {
        this.name = name;
    }

    public String getName() {
        return name;
    }
}
'''
        chunks = chunks_of(Language.JAVA, "S.java", code)
        cls = [c for c in chunks if c.kind is ChunkKind.CLASS]
        methods = [c for c in chunks if c.kind is ChunkKind.METHOD]
        assert len(cls) == 1
        assert len(methods) >= 2  # ctor + getter

    def test_csharp(self):
        code = '''
namespace App.Core
{
    public class Store
    {
        public int Count { get; set; }

        public void Add(string item)
        {
            Count++;
        }
    }

    public interface IStore
    {
    }
}
'''
        chunks = chunks_of(Language.CSHARP, "s.cs", code)
        kinds = {c.kind for c in chunks}
        assert ChunkKind.MOD in kinds
        assert ChunkKind.CLASS in kinds
        assert ChunkKind.INTERFACE in kinds
        assert ChunkKind.METHOD in kinds


class TestBeyondReferenceLanguages:
    def test_kotlin(self):
        code = '''
data class User(val name: String)

class Repository {
    fun findUser(id: Int): User? {
        return cache[id]
    }

    suspend fun loadAll(): List<User> {
        return api.fetch()
    }
}

object Singleton {
    fun instance() = Singleton
}

interface Store {
    fun get(key: String): String
}
'''
        chunks = chunks_of(Language.KOTLIN, "a.kt", code)
        kinds = {c.kind for c in chunks}
        assert ChunkKind.CLASS in kinds
        assert ChunkKind.METHOD in kinds
        assert ChunkKind.MOD in kinds       # object
        assert ChunkKind.INTERFACE in kinds
        find = next(c for c in chunks if "findUser" in (c.signature or ""))
        assert find.kind is ChunkKind.METHOD

    def test_swift(self):
        code = '''
struct Point {
    var x: Double
}

class Renderer {
    func draw(point: Point) {
        canvas.plot(point)
    }
}

enum Direction {
    case north
}

protocol Drawable {
    func draw()
}

extension Point {
    func flipped() -> Point {
        return Point(x: -x)
    }
}

func globalHelper() -> Int {
    return 42
}
'''
        chunks = chunks_of(Language.SWIFT, "a.swift", code)
        kinds = {c.kind for c in chunks}
        assert {ChunkKind.STRUCT, ChunkKind.CLASS, ChunkKind.ENUM,
                ChunkKind.INTERFACE, ChunkKind.IMPL,
                ChunkKind.FUNCTION, ChunkKind.METHOD} <= kinds

    def test_php(self):
        code = '''<?php

class OrderService {
    public function placeOrder(array $items): Order {
        return new Order($items);
    }

    private function validate($items) {
        return count($items) > 0;
    }
}

interface PaymentGateway {
    public function charge(int $amount);
}

trait Loggable {
    public function log(string $msg) {
        error_log($msg);
    }
}

function helper_function($x) {
    return $x * 2;
}
'''
        chunks = chunks_of(Language.PHP, "a.php", code)
        kinds = {c.kind for c in chunks}
        assert {ChunkKind.CLASS, ChunkKind.INTERFACE, ChunkKind.TRAIT,
                ChunkKind.FUNCTION, ChunkKind.METHOD} <= kinds
        place = next(c for c in chunks if "placeOrder" in (c.signature or ""))
        assert place.kind is ChunkKind.METHOD


class TestGapsAndSplitting:
    def test_unsupported_language_fallback(self):
        content = "Some random text file\nWith multiple lines\nThat should be chunked\nAs fallback"
        chunks = chunks_of(Language.UNKNOWN, "test.txt", content)
        assert chunks
        assert all(c.kind is ChunkKind.BLOCK for c in chunks)

    def test_chunk_splitting(self):
        chunker = SemanticChunker(5, 100, 1)
        large = "\n".join(f"line {i}" for i in range(20))
        chunk = Chunk(content=large, start_line=0, end_line=20, kind=ChunkKind.FUNCTION, path="t.rs")
        splits = chunker.split_if_needed(chunk)
        assert len(splits) > 1
        for s in splits:
            assert not s.is_complete
            assert s.split_index is not None
            assert "[Part" in s.content

    def test_split_preserves_docstring_on_first_only(self):
        chunker = SemanticChunker(5, 100, 1)
        chunk = Chunk(
            content="\n".join(f"l{i}" for i in range(12)),
            start_line=0, end_line=12, kind=ChunkKind.FUNCTION, path="t.rs",
            docstring="docs", signature="fn f()",
        )
        splits = chunker.split_if_needed(chunk)
        assert splits[0].docstring == "docs"
        assert all(s.docstring is None for s in splits[1:])

    def test_context_windows(self):
        code = "// before\n// before2\nfn f() {\n    1;\n}\n// after\n"
        chunks = chunks_of(Language.RUST, "t.rs", code)
        fn = next(c for c in chunks if c.kind is ChunkKind.FUNCTION)
        assert fn.context_prev and "before" in fn.context_prev
        assert fn.context_next and "after" in fn.context_next


class TestDedup:
    def test_dedup(self):
        a = Chunk(content="same", start_line=0, end_line=1, kind=ChunkKind.BLOCK, path="a")
        b = Chunk(content="same", start_line=5, end_line=6, kind=ChunkKind.BLOCK, path="b")
        c = Chunk(content="diff", start_line=0, end_line=1, kind=ChunkKind.BLOCK, path="c")
        d = ChunkDeduplicator()
        out = d.deduplicate([a, b, c])
        assert len(out) == 2
        assert d.stats.duplicates == 1
        assert d.stats.unique == 2


class TestCommentFamilies:
    """ADVICE round-1: Kotlin/Swift nest /* */; PHP has '#' line comments —
    braces or keywords inside such comments must not corrupt chunk spans."""

    def test_kotlin_nested_block_comment(self):
        code = """/* outer /* nested { fun fake() } */ still comment */
fun real(x: Int): Int {
    return x + 1
}
"""
        chunks = chunks_of(Language.KOTLIN, "a.kt", code)
        fns = [c for c in chunks if c.kind.value == "Function"]
        assert [f.signature and "real" in f.signature for f in fns] == [True]
        # the def starts after the comment (0-based line 1), not inside it
        assert fns[0].start_line == 1 and fns[0].end_line == 4

    def test_swift_nested_block_comment(self):
        code = """/* a /* nested func ghost() { */ b */
func real(x: Int) -> Int {
    return x + 1
}
"""
        chunks = chunks_of(Language.SWIFT, "a.swift", code)
        fns = [c for c in chunks if c.kind.value == "Function"]
        assert len(fns) == 1 and "real" in (fns[0].signature or "")

    def test_php_hash_comment(self):
        code = """<?php
# function ghost() { this is a comment with a brace {
function real($x) {
    return $x + 1;
}
"""
        chunks = chunks_of(Language.PHP, "a.php", code)
        fns = [c for c in chunks if c.kind.value == "Function"]
        assert len(fns) == 1 and "real" in (fns[0].signature or "")
        assert fns[0].start_line == 2


class TestReferenceGoldens:
    """Golden cases ported from the reference's tree-sitter chunker tests
    (/root/reference/src/chunker/semantic.rs:489-684) — the structural
    scanner must reproduce the same behavior on these inputs (VERDICT r1
    item 8), plus the known regex-vs-AST divergence risks it calls out."""

    def test_chunk_rust_code(self):
        code = '''
/// This is a doc comment
fn hello_world() {
    println!("Hello, world!");
}

fn add(a: i32, b: i32) -> i32 {
    a + b
}

struct Point {
    x: f64,
    y: f64,
}
'''
        chunks = chunks_of(Language.RUST, "test.rs", code)
        assert len(chunks) >= 3
        fns = [c for c in chunks if c.kind == ChunkKind.FUNCTION]
        assert len(fns) >= 2
        hello = next(c for c in fns if "hello_world" in c.content)
        assert hello.signature and "fn hello_world" in hello.signature
        assert hello.docstring and "doc comment" in hello.docstring
        assert any(c.kind == ChunkKind.STRUCT for c in chunks)

    def test_chunk_python_code(self):
        code = '''
def hello():
    """Say hello"""
    print("Hello!")

class Calculator:
    """A simple calculator"""

    def add(self, a, b):
        """Add two numbers"""
        return a + b
'''
        chunks = chunks_of(Language.PYTHON, "test.py", code)
        assert len(chunks) >= 2
        assert any(c.docstring for c in chunks)
        add = next(c for c in chunks if "def add" in c.content and c.kind == ChunkKind.METHOD)
        assert add.docstring and "Add two numbers" in add.docstring

    def test_chunk_unsupported_language_fallback(self):
        code = "Some random text file\nWith multiple lines\nThat should be chunked\nAs fallback"
        chunks = chunks_of(Language.UNKNOWN, "test.txt", code)
        assert chunks
        assert all(c.kind == ChunkKind.BLOCK for c in chunks)

    def test_context_breadcrumbs(self):
        code = '''
impl MyStruct {
    fn method(&self) {
        println!("method");
    }
}
'''
        chunks = chunks_of(Language.RUST, "test.rs", code)
        method = next(c for c in chunks if c.kind == ChunkKind.METHOD)
        assert len(method.context) >= 2
        assert method.context[0].startswith("File:")

    # --- divergence-risk cases the VERDICT names explicitly ---------------

    def test_rust_multiline_where_clause(self):
        code = '''
pub fn process<T, E>(items: Vec<T>) -> Result<Vec<T>, E>
where
    T: Clone + Send + 'static,
    E: std::error::Error,
{
    Ok(items)
}

fn after() {}
'''
        chunks = chunks_of(Language.RUST, "t.rs", code)
        fns = [c for c in chunks if c.kind == ChunkKind.FUNCTION]
        proc = next(c for c in fns if "process" in (c.signature or ""))
        # the where clause and the full body belong to the chunk
        assert "'static" in proc.content and "Ok(items)" in proc.content
        assert any("after" in (c.signature or "") for c in fns)

    def test_cpp_multiline_template_header(self):
        code = '''
template <typename K,
          typename V>
class HashMap {
public:
    V* find(const K& key) {
        return nullptr;
    }
};

int main() { return 0; }
'''
        chunks = chunks_of(Language.CPP, "t.cpp", code)
        cls = [c for c in chunks if c.kind == ChunkKind.CLASS]
        assert cls and "HashMap" in cls[0].content
        assert any("main" in (c.signature or "") for c in chunks)

    def test_python_decorated_def_with_arguments(self):
        code = '''
@app.route("/users/<int:user_id>", methods=["GET", "POST"])
@require_auth(roles=("admin",))
def get_user(user_id):
    """Fetch one user."""
    return db.get(user_id)
'''
        chunks = chunks_of(Language.PYTHON, "t.py", code)
        fn = next(c for c in chunks if c.kind == ChunkKind.FUNCTION)
        assert "def get_user" in (fn.signature or "")
        # decorators attach to the definition chunk (reference attaches
        # preceding attributes/decorators, semantic.rs visit path)
        assert "@app.route" in fn.content
        assert fn.docstring and "Fetch one user" in fn.docstring

    def test_nested_generics_in_cpp_signature(self):
        code = '''
std::map<std::string, std::vector<std::pair<int, int>>> build_index(const Input& in) {
    return {};
}
'''
        chunks = chunks_of(Language.CPP, "t.cpp", code)
        fn = next((c for c in chunks if c.kind == ChunkKind.FUNCTION), None)
        assert fn is not None and "build_index" in fn.content
