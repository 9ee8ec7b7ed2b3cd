/* Test driver: invoke the *reference* Gap_Improver on an exact trace given
 * on stdin and dump the improved path, so the Python gap improver can be
 * differentially tested against the reference implementation.
 *
 * Compiled against the read-only reference sources (-I/root/reference); this
 * file is test infrastructure only, not part of the framework.
 *
 * stdin:  abpos bbpos aepos bepos diffs tlen
 *         tlen exact-trace ints (align.h:79-87 encoding)
 *         A sequence (ACGT text)
 *         B sequence (ACGT text)
 * stdout: "I abpos bbpos aepos bepos diffs tlen" then tlen trace values.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "DB.h"
#include "align.h"

static char *read_seq(int *len)
{ static char buf[4 << 20];
  char *s;
  if (scanf("%s", buf+1) != 1) exit(1);
  *len = strlen(buf+1);
  s = malloc(*len + 2);
  memcpy(s+1, buf+1, *len);
  s[1 + *len] = '\0';
  { int i;
    for (i = 1; i <= *len; i++)
      switch (buf[i])
        { case 'A': s[i] = 0; break;
          case 'C': s[i] = 1; break;
          case 'G': s[i] = 2; break;
          default:  s[i] = 3; break;
        }
  }
  s[0] = 4;
  s[1 + *len] = 4;
  return s+1;
}

int main(void)
{ int abpos, bbpos, aepos, bepos, diffs, tlen;
  char *aseq, *bseq;
  int alen, blen;
  Alignment aln;
  Path path;
  Work_Data *work;
  int *trace;
  int i;

  if (scanf("%d %d %d %d %d %d", &abpos, &bbpos, &aepos, &bepos,
            &diffs, &tlen) != 6) return 1;
  /* generous over-allocation: Gap_Improver may rewrite in place */
  trace = malloc(sizeof(int) * (4 * tlen + 4096));
  for (i = 0; i < tlen; i++)
    if (scanf("%d", trace + i) != 1) return 1;
  aseq = read_seq(&alen);
  bseq = read_seq(&blen);

  work = New_Work_Data();

  path.abpos = abpos; path.bbpos = bbpos;
  path.aepos = aepos; path.bepos = bepos;
  path.diffs = diffs; path.tlen = tlen;
  path.trace = trace;

  aln.path = &path;
  aln.flags = 0;
  aln.aseq = aseq; aln.alen = alen;
  aln.bseq = bseq; aln.blen = blen;

  Gap_Improver(&aln, work);

  printf("I %d %d %d %d %d %d\n", path.abpos, path.bbpos, path.aepos,
         path.bepos, path.diffs, path.tlen);
  for (i = 0; i < path.tlen; i++)
    printf("%d ", ((int *) path.trace)[i]);
  printf("\n");
  return 0;
}
