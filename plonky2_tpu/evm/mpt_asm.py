"""In-kernel Merkle-Patricia-trie hashing: walk the linearized TrieData
segment, RLP-encode every node per yellow-paper appendix D and keccak the
root through KECCAK_GENERAL — so the announced trie-root digests become
facts of the constrained execution instead of unchecked prover inputs.

Reference correspondence: mpt_hash.asm / rlp encode.asm (sources absent
from the reference tree; behavior spec'd by
cpu/kernel/tests/mpt/hash.rs:14-131 — `mpt_hash_state_trie(retdest) ->
(root)` after the trie loader, root equal to eth_trie_utils'
`PartialTrie::calc_hash`).  The TrieData layout walked here is exactly
evm/mpt.py `all_mpt_prover_inputs` (mirroring generation/mpt.rs:37-173):

  state schema:   EMPTY | HASH h | BRANCH 0 c0..c15 | EXT cnt key c
                  | LEAF cnt key nonce balance <storage subtrie> code_hash
  storage schema: EMPTY | HASH h | BRANCH flag (x?) c0..c15 | EXT cnt key c
                  | LEAF cnt key x        (x = the scalar storage value)

`mpt_hash_node(rlp_pos, ptr, ret) -> (payload, blen, next_ptr)` returns
the yellow paper's c(J): blen == 32 means `payload` is the keccak digest
(big-endian int), blen < 32 means `payload` is the node's raw RLP packed
big-endian (embedded verbatim in the parent).  An account's storage_root
is recomputed from the embedded storage subtrie, so an account leaf cannot
announce a root its storage data doesn't hash to.

Scratch layout: RLP bytes build in Segment::TrieEncodedChild.  Each
recursion writes its node at its own `rlp_pos + 9` (9 = max header
reserve); a branch hands each child `rlp_pos = q` (the parent's append
cursor) — the child's result rides back on the stack, so its scratch may
be overwritten by the very ref bytes it produced.  Account / value
encodings assemble at `rlp_pos + 509`, beyond any node's own bytes.  The
active value schema lives in Segment::TrieEncodedChildLen[0] (0 = state,
1 = storage), saved/restored around the storage-subtree descent.

Byte extraction throughout uses DIV/MOD (bound to the arithmetic table by
ctl_arithmetic_div/_mod), never the unconstrained BYTE opcode, and no
shift table is required.
"""

MPT_ASM = """
// ---------------------------------------------------------------------------
// schema global (TrieEncodedChildLen[0]: 0 = state, 1 = storage)
// ---------------------------------------------------------------------------

%macro mpt_schema_load
    PUSH 0
    PUSH @SEGMENT_TRIE_ENCODED_CHILD_LEN
    PUSH 0
    MLOAD_GENERAL
%endmacro

%macro mpt_schema_store
    // (v) -> ()
    %stack (v) -> (0, @SEGMENT_TRIE_ENCODED_CHILD_LEN, 0, v)
    MSTORE_GENERAL
%endmacro

%macro tdload
    // (virt) -> (TrieData[virt])
    PUSH @SEGMENT_TRIE_DATA
    PUSH 0
    MLOAD_GENERAL
%endmacro

%macro add_const(c)
    // (x) -> (x + c)
    %stack (x) -> (x, $c)
    ADD
%endmacro

%macro sub_const(c)
    // (x) -> (x - c)
    %stack (x) -> (x, $c)
    SUB
%endmacro

// ---------------------------------------------------------------------------
// small helpers
// ---------------------------------------------------------------------------

// (v, ret) -> (len): byte length of the RLP of scalar v (1 or 1+bytelen)
GLOBAL rlp_scalar_len:
    DUP1
    PUSH 0x80
    GT
    PUSH rsl_single
    JUMPI
    %stack (v) -> (v, rsl_len)
    PUSH u256_bytelen
    JUMP
rsl_len:
    // blen, ret
    %add_const(1)
    %stack (l, ret) -> (ret, l)
    JUMP
rsl_single:
    %stack (v, ret) -> (ret, 1)
    JUMP

// (pos, count, packed, is_leaf, ret) -> (pos'): hex-prefix encoding of a
// nibble string (yellow paper appendix C) written as a complete RLP
// STRING item into TrieEncodedChild at pos — the 1 + count/2 hp bytes get
// an 0x80+len header unless they are a single byte (< 0x80 always: the
// flag nibble is at most 3)
GLOBAL hp_write:
    DUP2
    PUSH 2
    GT
    PUSH hp_nohdr
    JUMPI
    DUP2
    %stack (c) -> (c, 2)
    DIV
    %add_const(0x81)
    // hdr = 0x80 + 1 + count/2, pos, count, packed, is_leaf, ret
    DUP2
    %stack (pos, hdr) -> (0, @SEGMENT_TRIE_ENCODED_CHILD, pos, hdr)
    MSTORE_GENERAL
    %add_const(1)
hp_nohdr:
    DUP2
    PUSH 1
    AND
    PUSH hp_odd
    JUMPI
    // even count: first byte = (2*is_leaf) << 4
    DUP4
    %stack (l) -> (l, 32)
    MUL
    // fb, pos, count, packed, is_leaf, ret
    DUP2
    %stack (pos, fb) -> (0, @SEGMENT_TRIE_ENCODED_CHILD, pos, fb)
    MSTORE_GENERAL
    // pos, count, packed, is_leaf, ret
    %stack (pos, count, packed, is_leaf) -> (count, 2, pos, packed)
    DIV
    // nb = count/2, pos, packed, ret
    %stack (nb, pos, packed) -> (pos, 1, nb, packed, nb, pos)
    ADD
    // pos+1, nb, packed, nb, pos, ret
    %stack (pos1, nb, packed) -> (@SEGMENT_TRIE_ENCODED_CHILD, packed, pos1, nb, hpw_done)
    PUSH store_be
    JUMP
hp_odd:
    // pos, count, packed, is_leaf, ret
    // pw = 16^(count-1)
    DUP2
    %sub_const(1)
    PUSH 1
    // pw=1, c1, pos, count, packed, is_leaf, ret
hpo_pw:
    DUP2
    ISZERO
    PUSH hpo_pw_done
    JUMPI
    %stack (pw) -> (16, pw)
    MUL
    SWAP1
    %sub_const(1)
    SWAP1
    PUSH hpo_pw
    JUMP
hpo_pw_done:
    SWAP1
    POP
    // pw, pos, count, packed, is_leaf, ret
    // nib0 = packed / pw
    DUP4
    DUP2
    SWAP1
    DIV
    // nib0, pw, pos, count, packed, is_leaf, ret
    // fb = (1 + 2*is_leaf) << 4 | nib0  =  16 + 32*is_leaf + nib0
    DUP6
    %stack (l) -> (l, 32)
    MUL
    ADD
    %add_const(16)
    // fb, pw, pos, count, packed, is_leaf, ret
    DUP3
    %stack (pos, fb) -> (0, @SEGMENT_TRIE_ENCODED_CHILD, pos, fb)
    MSTORE_GENERAL
    // pw, pos, count, packed, is_leaf, ret
    // rest = packed mod pw
    DUP4
    MOD
    // rest, pos, count, packed, is_leaf, ret
    // nb = (count-1)/2
    DUP3
    %sub_const(1)
    %stack (c1) -> (c1, 2)
    DIV
    // nb, rest, pos, count, packed, is_leaf, ret
    %stack (nb, rest, pos, count, packed, is_leaf) -> (pos, 1, nb, rest, nb, pos)
    ADD
    %stack (pos1, nb, rest) -> (@SEGMENT_TRIE_ENCODED_CHILD, rest, pos1, nb, hpw_done)
    PUSH store_be
    JUMP
hpw_done:
    // nb, pos, ret
    ADD
    %add_const(1)
    %stack (p, ret) -> (ret, p)
    JUMP

// (q, cpay, cblen, ret) -> (q'): append a child reference c(J) at q —
// 0xa0 + 32 digest bytes when cblen == 32, the raw RLP bytes verbatim
// otherwise
GLOBAL append_child_ref:
    DUP3
    PUSH 32
    EQ
    PUSH acr_hash
    JUMPI
    %stack (q, cpay, cblen) -> (@SEGMENT_TRIE_ENCODED_CHILD, cpay, q, cblen, acr_done, q, cblen)
    PUSH store_be
    JUMP
acr_done:
    // q, cblen, ret
    ADD
    %stack (qn, ret) -> (ret, qn)
    JUMP
acr_hash:
    DUP1
    %stack (q) -> (0, @SEGMENT_TRIE_ENCODED_CHILD, q, 0xa0)
    MSTORE_GENERAL
    // q, cpay, cblen(=32), ret
    %stack (q, cpay, cblen) -> (q, 1, cpay, q, cblen)
    ADD
    // q+1, cpay, q, cblen, ret
    %stack (q1, cpay, q, cblen) -> (@SEGMENT_TRIE_ENCODED_CHILD, cpay, q1, 32, acr_hdone, q, cblen)
    PUSH store_be
    JUMP
acr_hdone:
    // q, 32, ret
    ADD
    %add_const(1)
    %stack (qn, ret) -> (ret, qn)
    JUMP

// (rlp_pos, q, next, ret) -> (payload, blen, next): shared node tail —
// list-prefix the payload at [rlp_pos+9, q), then inline (<32 bytes) or
// keccak (-> big-endian digest)
GLOBAL mpt_finish_node:
    %stack (rlp_pos, q) -> (rlp_pos, 9, q)
    ADD
    // ps, q, next, ret
    DUP1
    DUP3
    SUB
    // L = q - ps, ps, q, next, ret
    %stack (l, ps) -> (@SEGMENT_TRIE_ENCODED_CHILD, ps, l, mfn_prefix)
    PUSH rlp_write_list_prefix
    JUMP
mfn_prefix:
    // hstart, q, next, ret
    DUP2
    DUP2
    SWAP1
    SUB
    // total = q - hstart, hstart, q, next, ret
    DUP1
    PUSH 32
    GT
    PUSH mfn_inline
    JUMPI
    %stack (total, hstart, q, next) -> (0, @SEGMENT_TRIE_ENCODED_CHILD, hstart, total, next)
    KECCAK_GENERAL
    // digest (LE-packed), next, ret
    %stack (d) -> (d, mfn_swapped)
    PUSH u256_byteswap
    JUMP
mfn_swapped:
    %stack (d, next, ret) -> (ret, d, 32, next)
    JUMP
mfn_inline:
    %stack (total, hstart, q, next) -> (@SEGMENT_TRIE_ENCODED_CHILD, hstart, total, mfn_loaded, total, next)
    PUSH load_be
    JUMP
mfn_loaded:
    // payload, total, next, ret
    %stack (payload, total, next, ret) -> (ret, payload, total, next)
    JUMP

// ---------------------------------------------------------------------------
// the recursive node hasher
// ---------------------------------------------------------------------------

// (rlp_pos, ptr, ret) -> (payload, blen, next_ptr)
GLOBAL mpt_hash_node:
    DUP2
    %tdload
    // type, rlp_pos, ptr, ret
    DUP1
    ISZERO
    PUSH mhn_empty
    JUMPI
    DUP1
    PUSH 1
    EQ
    PUSH mhn_hash
    JUMPI
    DUP1
    PUSH 2
    EQ
    PUSH mhn_branch
    JUMPI
    DUP1
    PUSH 3
    EQ
    PUSH mhn_ext
    JUMPI
    DUP1
    PUSH 4
    EQ
    PUSH mhn_leaf
    JUMPI
    PANIC

mhn_empty:
    // c(empty) = 0x80 (the RLP of the empty string)
    %stack (t, rlp_pos, ptr) -> (ptr, 1)
    ADD
    %stack (next, ret) -> (ret, 0x80, 1, next)
    JUMP

mhn_hash:
    %stack (t, rlp_pos, ptr) -> (ptr, 1, ptr, 2)
    ADD
    %tdload
    // h, ptr, 2, ret
    %stack (h, ptr, two) -> (ptr, two, h)
    ADD
    %stack (next, h, ret) -> (ret, h, 32, next)
    JUMP

// --- extension ---------------------------------------------------------

mhn_ext:
    POP
    // rlp_pos, ptr, ret
    %stack (rlp_pos, ptr) -> (ptr, 3, rlp_pos, ptr)
    ADD
    // cptr, rlp_pos, ptr, ret
    %stack (cptr, rlp_pos) -> (rlp_pos, cptr, mhe_child, rlp_pos)
    PUSH mpt_hash_node
    JUMP
mhe_child:
    // cpay, cblen, cnext, rlp_pos, ptr, ret
    DUP5
    %add_const(1)
    %tdload
    // count, cpay, cblen, cnext, rlp_pos, ptr, ret
    DUP6
    %add_const(2)
    %tdload
    // packed, count, cpay, cblen, cnext, rlp_pos, ptr, ret
    DUP6
    %add_const(9)
    // ps, packed, count, cpay, cblen, cnext, rlp_pos, ptr, ret
    %stack (ps, packed, count) -> (ps, count, packed, 0, mhe_hp)
    PUSH hp_write
    JUMP
mhe_hp:
    // p1, cpay, cblen, cnext, rlp_pos, ptr, ret
    %stack (p1, cpay, cblen) -> (p1, cpay, cblen, mhe_ref)
    PUSH append_child_ref
    JUMP
mhe_ref:
    // q, cnext, rlp_pos, ptr, ret
    %stack (q, cnext, rlp_pos, ptr, ret) -> (rlp_pos, q, cnext, ret)
    PUSH mpt_finish_node
    JUMP

// --- branch ------------------------------------------------------------

mhn_branch:
    POP
    // rlp_pos, ptr, ret
    DUP2
    %add_const(1)
    %tdload
    // flag, rlp_pos, ptr, ret
    DUP1
    ISZERO
    PUSH mhb_noval
    JUMPI
    // flag == 1: a branch value exists (storage schema only)
    %mpt_schema_load
    ISZERO
    PUSH mhb_badstate
    JUMPI
    DUP3
    %add_const(2)
    %tdload
    // x, flag, rlp_pos, ptr, ret
    %stack (x, flag, rlp_pos, ptr) -> (ptr, 3, x, 1, rlp_pos, ptr)
    ADD
    // cptr, x, 1, rlp_pos, ptr, ret
    PUSH mhb_children
    JUMP
mhb_noval:
    %stack (flag, rlp_pos, ptr) -> (ptr, 2, 0, 0, rlp_pos, ptr)
    ADD
    // cptr, x=0, hasv=0, rlp_pos, ptr, ret
mhb_children:
    DUP4
    %add_const(9)
    // q = rlp_pos+9, cptr, x, hasv, rlp_pos, ptr, ret
    SWAP1
    PUSH 16
    // i=16, cptr, q, x, hasv, rlp_pos, ptr, ret
mhb_loop:
    DUP1
    ISZERO
    PUSH mhb_valtail
    JUMPI
    // recurse: child scratch = q (its result returns on the stack)
    %stack (i, cptr, q) -> (q, cptr, mhb_child, i, q)
    PUSH mpt_hash_node
    JUMP
mhb_child:
    // cpay, cblen, cnext, i, q, x, hasv, rlp_pos, ptr, ret
    %stack (cpay, cblen, cnext, i, q) -> (q, cpay, cblen, mhb_ref, i, cnext)
    PUSH append_child_ref
    JUMP
mhb_ref:
    // q', i, cnext, x, hasv, rlp_pos, ptr, ret
    SWAP1
    %sub_const(1)
    // i-1, q', cnext, x, hasv, ...
    SWAP2
    SWAP1
    SWAP2
    // i-1, cnext, q', x, hasv, rlp_pos, ptr, ret   (loop frame restored)
    PUSH mhb_loop
    JUMP
mhb_valtail:
    // i(=0), cptr(= next_ptr), q, x, hasv, rlp_pos, ptr, ret
    POP
    SWAP1
    // q, next, x, hasv, rlp_pos, ptr, ret
    DUP4
    ISZERO
    PUSH mhb_empty_val
    JUMPI
    // 17th item = string of rlp(x): inner scalar builds at rlp_pos+509
    DUP5
    %add_const(509)
    // a0, q, next, x, hasv, rlp_pos, ptr, ret
    DUP4
    // x, a0, q, next, x, hasv, rlp_pos, ptr, ret
    %stack (x, a0) -> (@SEGMENT_TRIE_ENCODED_CHILD, a0, x, mhb_x)
    PUSH rlp_write_scalar
    JUMP
mhb_x:
    // a1, q, next, x, hasv, rlp_pos, ptr, ret
    DUP6
    %add_const(509)
    SWAP1
    SUB
    // vlen = a1 - a0, q, next, x, hasv, rlp_pos, ptr, ret
    %stack (vlen, q) -> (@SEGMENT_TRIE_ENCODED_CHILD, q, vlen, mhb_vs, vlen)
    PUSH rlp_write_str_prefix_fwd
    JUMP
mhb_vs:
    // q2, vlen, next, x, hasv, rlp_pos, ptr, ret
    DUP6
    %add_const(509)
    // a0, q2, vlen, next, x, hasv, rlp_pos, ptr, ret
    %stack (a0, q2, vlen) -> (@SEGMENT_TRIE_ENCODED_CHILD, q2, @SEGMENT_TRIE_ENCODED_CHILD, a0, vlen, mhb_cp, q2, vlen)
    PUSH mem_copy
    JUMP
mhb_cp:
    // q2, vlen, next, x, hasv, rlp_pos, ptr, ret
    ADD
    // q3, next, x, hasv, rlp_pos, ptr, ret
    %stack (q3, next, x, hasv, rlp_pos, ptr, ret) -> (rlp_pos, q3, next, ret)
    PUSH mpt_finish_node
    JUMP
mhb_empty_val:
    // q, next, x, hasv, rlp_pos, ptr, ret
    DUP1
    %stack (q) -> (0, @SEGMENT_TRIE_ENCODED_CHILD, q, 0x80)
    MSTORE_GENERAL
    %add_const(1)
    %stack (q1, next, x, hasv, rlp_pos, ptr, ret) -> (rlp_pos, q1, next, ret)
    PUSH mpt_finish_node
    JUMP
mhb_badstate:
    PANIC

// --- leaf ----------------------------------------------------------------

mhn_leaf:
    POP
    %mpt_schema_load
    PUSH mhl_storage
    JUMPI
    // === state account leaf ===
    // rlp_pos, ptr, ret
    // hash the embedded storage subtrie first (schema flips to storage);
    // its scratch may use rlp_pos - our own bytes are written after
    PUSH 1
    %mpt_schema_store
    %stack (rlp_pos, ptr) -> (ptr, 5, rlp_pos, rlp_pos, ptr)
    ADD
    // sptr, rlp_pos, rlp_pos, ptr, ret
    %stack (sptr, rlp_pos) -> (rlp_pos, sptr, mhl_stor_done)
    PUSH mpt_hash_root
    JUMP
mhl_stor_done:
    // sroot, snext, rlp_pos, ptr, ret
    PUSH 0
    %mpt_schema_store
    DUP2
    %tdload
    // code_hash, sroot, snext, rlp_pos, ptr, ret
    DUP5
    %add_const(3)
    %tdload
    // nonce, ch, sroot, snext, rlp_pos, ptr, ret
    DUP6
    %add_const(4)
    %tdload
    // balance, nonce, ch, sroot, snext, rlp_pos, ptr, ret
    // account RLP builds at a0 = rlp_pos + 509
    DUP6
    %add_const(509)
    // a0, balance, nonce, ch, sroot, snext, rlp_pos, ptr, ret
    %stack (a0, balance, nonce) -> (@SEGMENT_TRIE_ENCODED_CHILD, a0, nonce, mhl_n, balance)
    PUSH rlp_write_scalar
    JUMP
mhl_n:
    // a1, balance, ch, sroot, snext, rlp_pos, ptr, ret
    %stack (a1, balance) -> (@SEGMENT_TRIE_ENCODED_CHILD, a1, balance, mhl_b)
    PUSH rlp_write_scalar
    JUMP
mhl_b:
    // a2, ch, sroot, snext, rlp_pos, ptr, ret
    %stack (a2, ch, sroot) -> (a2, sroot, 32, mhl_sr, ch)
    PUSH append_child_ref
    JUMP
mhl_sr:
    // a3, ch, snext, rlp_pos, ptr, ret
    %stack (a3, ch) -> (a3, ch, 32, mhl_ch)
    PUSH append_child_ref
    JUMP
mhl_ch:
    // a4, snext, rlp_pos, ptr, ret
    // apl = a4 - a0; account list prefix ends at a0 -> ahstart
    DUP3
    %add_const(509)
    DUP2
    SUB
    // apl = a4 - a0, a4, snext, rlp_pos, ptr, ret
    DUP4
    %add_const(509)
    // a0, apl, a4, snext, rlp_pos, ptr, ret
    %stack (a0, apl) -> (@SEGMENT_TRIE_ENCODED_CHILD, a0, apl, mhl_alp)
    PUSH rlp_write_list_prefix
    JUMP
mhl_alp:
    // ahstart, a4, snext, rlp_pos, ptr, ret
    DUP1
    DUP3
    SUB
    // alen = a4 - ahstart, ahstart, a4, snext, rlp_pos, ptr, ret
    SWAP2
    POP
    // ahstart, alen, snext, rlp_pos, ptr, ret
    // hex-prefix (leaf) at ps = rlp_pos + 9
    DUP5
    %add_const(1)
    %tdload
    // count, ahstart, alen, snext, rlp_pos, ptr, ret
    DUP6
    %add_const(2)
    %tdload
    // packed, count, ahstart, alen, snext, rlp_pos, ptr, ret
    DUP6
    %add_const(9)
    // ps, packed, count, ahstart, alen, snext, rlp_pos, ptr, ret
    %stack (ps, packed, count) -> (ps, count, packed, 1, mhl_hp)
    PUSH hp_write
    JUMP
mhl_hp:
    // p1, ahstart, alen, snext, rlp_pos, ptr, ret
    DUP3
    // alen, p1, ahstart, alen, snext, rlp_pos, ptr, ret
    SWAP1
    %stack (p1, alen) -> (@SEGMENT_TRIE_ENCODED_CHILD, p1, alen, mhl_vs)
    PUSH rlp_write_str_prefix_fwd
    JUMP
mhl_vs:
    // p2, ahstart, alen, snext, rlp_pos, ptr, ret
    %stack (p2, ahstart, alen) -> (@SEGMENT_TRIE_ENCODED_CHILD, p2, @SEGMENT_TRIE_ENCODED_CHILD, ahstart, alen, mhl_cp, p2, alen)
    PUSH mem_copy
    JUMP
mhl_cp:
    // p2, alen, snext, rlp_pos, ptr, ret
    ADD
    // q, snext, rlp_pos, ptr, ret
    SWAP1
    %add_const(1)
    SWAP1
    // q, next = snext+1 (code_hash word), rlp_pos, ptr, ret
    %stack (q, next, rlp_pos, ptr, ret) -> (rlp_pos, q, next, ret)
    PUSH mpt_finish_node
    JUMP

mhl_storage:
    // === storage leaf: value is the scalar TD[ptr+3] ===
    // rlp_pos, ptr, ret
    DUP2
    %add_const(3)
    %tdload
    // x, rlp_pos, ptr, ret
    DUP2
    %add_const(509)
    // a0, x, rlp_pos, ptr, ret
    %stack (a0, x) -> (@SEGMENT_TRIE_ENCODED_CHILD, a0, x, mhls_x)
    PUSH rlp_write_scalar
    JUMP
mhls_x:
    // a1, rlp_pos, ptr, ret
    DUP2
    %add_const(509)
    SWAP1
    SUB
    // vlen = a1 - a0, rlp_pos, ptr, ret
    DUP3
    %add_const(1)
    %tdload
    // count, vlen, rlp_pos, ptr, ret
    DUP4
    %add_const(2)
    %tdload
    // packed, count, vlen, rlp_pos, ptr, ret
    DUP4
    %add_const(9)
    // ps, packed, count, vlen, rlp_pos, ptr, ret
    %stack (ps, packed, count) -> (ps, count, packed, 1, mhls_hp)
    PUSH hp_write
    JUMP
mhls_hp:
    // p1, vlen, rlp_pos, ptr, ret
    DUP2
    SWAP1
    %stack (p1, vlen) -> (@SEGMENT_TRIE_ENCODED_CHILD, p1, vlen, mhls_vs)
    PUSH rlp_write_str_prefix_fwd
    JUMP
mhls_vs:
    // p2, vlen, rlp_pos, ptr, ret
    DUP3
    %add_const(509)
    // a0, p2, vlen, rlp_pos, ptr, ret
    %stack (a0, p2, vlen) -> (@SEGMENT_TRIE_ENCODED_CHILD, p2, @SEGMENT_TRIE_ENCODED_CHILD, a0, vlen, mhls_cp, p2, vlen)
    PUSH mem_copy
    JUMP
mhls_cp:
    // p2, vlen, rlp_pos, ptr, ret
    ADD
    // q, rlp_pos, ptr, ret
    %stack (q, rlp_pos, ptr) -> (ptr, 4, rlp_pos, q)
    ADD
    // next = ptr+4, rlp_pos, q, ret
    %stack (next, rlp_pos, q, ret) -> (rlp_pos, q, next, ret)
    PUSH mpt_finish_node
    JUMP

// ---------------------------------------------------------------------------
// roots
// ---------------------------------------------------------------------------

// (rlp_pos, ptr, ret) -> (root, next_ptr): top-level calc_hash — a HASH
// node passes its digest through, a big node's c() already IS the keccak,
// a small encoding gets keccaked here
GLOBAL mpt_hash_root:
    %stack (rlp_pos, ptr) -> (rlp_pos, ptr, mhr_node, rlp_pos)
    PUSH mpt_hash_node
    JUMP
mhr_node:
    // payload, blen, next, rlp_pos, ret
    DUP2
    PUSH 32
    EQ
    PUSH mhr_is32
    JUMPI
    %stack (payload, blen, next, rlp_pos) -> (rlp_pos, 9, payload, blen, next)
    ADD
    // ps, payload, blen, next, ret
    %stack (ps, payload, blen) -> (@SEGMENT_TRIE_ENCODED_CHILD, payload, ps, blen, mhr_stored, ps, blen)
    PUSH store_be
    JUMP
mhr_stored:
    // ps, blen, next, ret
    %stack (ps, blen) -> (0, @SEGMENT_TRIE_ENCODED_CHILD, ps, blen)
    KECCAK_GENERAL
    %stack (d) -> (d, mhr_swapped)
    PUSH u256_byteswap
    JUMP
mhr_swapped:
    %stack (d, next, ret) -> (ret, d, next)
    JUMP
mhr_is32:
    %stack (payload, blen, next, rlp_pos, ret) -> (ret, payload, next)
    JUMP

// (ret) -> (root): reference spec mpt/hash.rs test_state_trie — state trie
// data starts at TrieData[0]
GLOBAL mpt_hash_state_trie:
    PUSH 0
    %mpt_schema_store
    %stack () -> (0, 0, mhst_done)
    PUSH mpt_hash_root
    JUMP
mhst_done:
    // root, next, ret
    SWAP1
    POP
    %stack (root, ret) -> (ret, root)
    JUMP
"""
