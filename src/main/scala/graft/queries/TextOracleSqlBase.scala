package graft.queries

/** Shared escape hook for the text-oracle traits (one definition, no
  * per-trait private copies to drift). */
private[queries] trait TextOracleSqlBase {
  protected def esc(s: String): String = OracleSqlUtil.esc(s)
}
